"""Continuous ingest: the STREAM_UPDATE analog.

The reference declares its index STREAM_UPDATE (index_manager.py:53)
and mutates it live via upsert_datapoints (setup_vector_search.py:
147-153). Structured Streaming gives the same contract: a stream of
document rows, each micro-batch embedded and MERGEd into the index
table by key via ``foreachBatch`` -- exactly-once per batch under the
checkpoint + idempotent-merge combination (merge is keyed, so replays
converge).

Without Delta in this image, the merge is BUCKET-PRUNED copy-on-write
parquet: the index lives ``partitionBy("_bucket")`` where ``_bucket =
pmod(xxhash64(key), n_buckets)``, and a micro-batch rewrites ONLY the
bucket directories that contain updated keys (dynamic partition
overwrite). Per-batch cost is O(touched buckets), not O(index): a
1000-row batch against a 100 TB index with 65k buckets touches at most
1000 buckets ~ 0.0015% of bytes. Untouched bucket files are left
byte-identical (asserted in tests/test_streaming.py). At real scale the
same ``foreachBatch`` body targets Delta/Iceberg MERGE INTO; the seam
(DataFrame-in, DataFrame-out merge) is storage-agnostic by design.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.ingest import ingest_documents
from ..operators.upsert import merge_by_key

DEFAULT_MERGE_BUCKETS = 32


def _bucket_expr(key_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


def _is_path_not_found(e: AnalysisException) -> bool:
    msg = str(e)
    return "PATH_NOT_FOUND" in msg or "Path does not exist" in msg


def stream_merge_into_index(
    stream_df: DataFrame,
    index_path: str,
    *,
    checkpoint_dir: str,
    dim: int = 64,
    id_source_col: str = "doc_id",
    text_col: str = "text",
    trigger_seconds: int | None = None,
    n_buckets: int = DEFAULT_MERGE_BUCKETS,
    txlog: bool = False,
):
    """Start a streaming query that upserts each micro-batch of documents
    into the bucket-partitioned datapoints table at ``index_path``.

    Returns the StreamingQuery; callers drive it with
    ``processAllAvailable()`` in tests or ``awaitTermination()`` in prod
    (the reference's LRO wait, index_manager.py:117-138, becomes this).

    Size ``n_buckets`` so one bucket's rows fit executor memory at the
    target scale (~ index_rows / n_buckets rows per merge task); the
    key->bucket map is a pure hash, so buckets never need rebalancing.

    ``txlog=True`` (r15) commits each epoch's bucket surgery through
    the transactional log (``sources/txlog.py``) instead of a dynamic
    partition overwrite: concurrent maintenance (compaction, z-order)
    can run WITHOUT pausing the stream -- the manifest publish is the
    conflict point, a lost race surfaces as an epoch retry, and the
    (checkpoint_dir, epoch_id) txn meta makes replays exactly-once at
    the storage layer, not just the checkpoint layer. Readers of a tx
    index must use ``read_table_any``.
    """

    def _merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        result = ingest_documents(
            batch_df, id_source_col=id_source_col, text_col=text_col, dim=dim
        )
        if txlog:
            from ..sources.txlog import tx_merge

            tx_merge(
                spark,
                index_path,
                result.datapoints,
                key="data_point_id",
                n_buckets=n_buckets,
                meta={
                    "txn_app": checkpoint_dir,
                    "txn_batch": int(epoch_id),
                },
            )
            return
        updates = result.datapoints.withColumn(
            "_bucket", _bucket_expr("data_point_id", n_buckets)
        )
        try:
            base = spark.read.parquet(index_path)
        except AnalysisException as e:
            # ONLY a genuinely absent path means "first batch". Any other
            # failure (IO error, corrupt footer, permissions) must re-raise
            # so the micro-batch retries instead of silently replacing the
            # whole index with this batch.
            if not _is_path_not_found(e):
                raise
            updates.write.mode("errorifexists").partitionBy("_bucket").parquet(
                index_path
            )
            return

        # Bucket pruning: read + merge + rewrite only the buckets that
        # contain updated keys. The collect is of distinct bucket ids --
        # bounded by n_buckets ints, never by batch or index size.
        touched = sorted(
            r[0] for r in updates.select("_bucket").distinct().collect()
        )
        base_touched = base.filter(F.col("_bucket").isin(touched))
        merged = merge_by_key(base_touched, updates, key="data_point_id")
        # Cut lineage (materialize) before overwriting paths the plan
        # reads from; dynamic partition overwrite replaces ONLY the
        # partitions present in the output -- untouched bucket dirs keep
        # their files byte-for-byte.
        merged.localCheckpoint(eager=True).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("_bucket").parquet(index_path)

    writer = stream_df.writeStream.foreachBatch(_merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
