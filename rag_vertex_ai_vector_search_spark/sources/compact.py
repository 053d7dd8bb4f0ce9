"""Small-file compaction for parquet table paths.

Streaming sinks are small-file factories: the bucket-pruned merge
(streaming/ingest.py) and the epoch rollup (streaming/rollup.py) each
land one-or-more files per micro-batch, and at 100 TB a scan's task
count -- and the namenode/object-store listing cost -- is driven by
FILE COUNT, not bytes. Compaction is the maintenance pass that folds
accumulated small files back to ~target-sized ones so scans stay at
one task per ~128 MB instead of one task per micro-batch.

Spark-first shape: plain ``read -> coalesce(ceil(bytes/target)) ->
write``. ``coalesce`` (not ``repartition``) merges input splits
WITHOUT a shuffle -- compaction moves every byte once, network-free.
The rewrite goes to a temp sibling directory and is swapped in with
filesystem renames; on HDFS that swap is two atomic metadata ops, on
object stores it is not atomic and a transactional table format
(Delta/Iceberg OPTIMIZE) is the production seam -- the DataFrame body
is identical. Run with writers paused, same restriction as
``compact_rollup``.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def table_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(data_file_count, total_bytes) under ``path``, recursively,
    ignoring hidden/metadata files (_SUCCESS, .crc, ...)."""
    fs, jpath = _fs_and_path(spark, path)
    it = fs.listFiles(jpath, True)
    n_files = 0
    total = 0
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        n_files += 1
        total += status.getLen()
    return n_files, total


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    partition_cols: tuple[str, ...] = (),
    min_files_to_compact: int = 2,
) -> int:
    """Rewrite ``path`` with ~``target_file_bytes`` files. Returns the
    file count after compaction (unchanged if below the threshold).

    For a partitioned table pass ``partition_cols``: rows are
    shuffle-free-coalesced globally and re-written ``partitionBy`` the
    same columns, folding per-partition-dir file fragments. (Parquet
    compression ratios mean output sizing from input bytes is an
    estimate; it errs toward fewer, larger files, which is the cheap
    direction for scans.)
    """
    n_files, total_bytes = table_file_stats(spark, path)
    if n_files < min_files_to_compact:
        return n_files
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    if n_out >= n_files:
        return n_files

    df = spark.read.parquet(path).coalesce(n_out)
    tmp = path.rstrip("/") + ".__compact_tmp__"
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)

    fs, jpath = _fs_and_path(spark, path)
    _, jtmp = _fs_and_path(spark, tmp)
    fs.delete(jpath, True)
    fs.rename(jtmp, jpath)
    return table_file_stats(spark, path)[0]
