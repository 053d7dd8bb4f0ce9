"""Keyed merge / point ops: the metadata-store + index-mutation surface.

Reference semantics:
- upsert_datapoints -- insert-or-replace by datapoint id into the live
  index (setup_vector_search.py:147-153, STREAM_UPDATE
  index_manager.py:53).
- point get by key (firestore_ops.py:90-107), partial update with
  auto-stamped ``updated_at`` (firestore_ops.py:109-122).

Spark-first: MERGE without Delta = union + row_number keep-latest.
The window shuffles on the key only once; at scale the base table
should be written bucketed by the key so repeated merges co-locate.
Idempotence (applying the same batch twice == once) is a property test
in tests/test_upsert.py.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_by_key(
    base: DataFrame,
    updates: DataFrame,
    key: str = "data_point_id",
    precedence_col: str | None = None,
) -> DataFrame:
    """Insert-or-replace rows of ``updates`` into ``base`` by ``key``.

    An update row always wins over a base row with the same key
    (matching upsert_datapoints replace semantics). Within each source,
    later ``precedence_col`` wins when given; otherwise inputs are
    assumed key-unique (the reference generates one uuid per row,
    setup_vector_search.py:39).
    """
    tagged = base.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    order = [F.col("_src").desc()]
    if precedence_col is not None:
        order.append(F.col(precedence_col).desc())
    w = Window.partitionBy(key).orderBy(*order)
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def point_lookup(df: DataFrame, key_value, key: str = "data_point_id") -> DataFrame:
    """Point get: equality filter + limit 1 (firestore_ops.py:90-107).

    The filter is a pushable parquet predicate; on a table bucketed or
    sorted by the key this prunes to a handful of row groups.
    """
    return df.filter(F.col(key) == F.lit(key_value)).limit(1)


def point_update(
    df: DataFrame,
    key_value,
    updates: Mapping[str, Column],
    key: str = "data_point_id",
    stamp_col: str | None = "updated_at",
) -> DataFrame:
    """Partial-field update of one keyed row (firestore_ops.py:109-122).

    Returns the full table with the row modified; ``updated_at`` is
    stamped like the reference's ``firestore.SERVER_TIMESTAMP``.
    """
    hit = F.col(key) == F.lit(key_value)
    out = df
    for col_name, value in updates.items():
        out = out.withColumn(col_name, F.when(hit, value).otherwise(F.col(col_name)))
    if stamp_col is not None and stamp_col in df.columns:
        out = out.withColumn(
            stamp_col,
            F.when(hit, F.current_timestamp()).otherwise(F.col(stamp_col)),
        )
    return out


def _is_path_not_found(e: Exception) -> bool:
    msg = str(e)
    return "PATH_NOT_FOUND" in msg or "Path does not exist" in msg


def merge_into_table(
    spark,
    path: str,
    updates: DataFrame,
    *,
    key: str = "data_point_id",
    fmt: str = "parquet",
    precedence_col: str | None = None,
    n_buckets: int = 64,
) -> None:
    """Transactional-style MERGE of ``updates`` into the keyed table at
    ``path`` -- the storage-level counterpart of ``merge_by_key``.

    ``fmt="parquet"`` (always available): copy-on-write with bucket
    pruning. The table is laid out as ``_bucket = pmod(xxhash64(key),
    n_buckets)`` partition dirs; a merge reads ONLY the buckets that
    contain updated keys, keep-latest-merges them, and replaces just
    those partition dirs via dynamic partition overwrite (untouched
    buckets keep their files byte-for-byte). Job-atomic via the Hadoop
    commit protocol, but not safe under CONCURRENT writers.

    ``fmt="delta"``: a real ``MERGE INTO`` through delta-spark
    (whenMatchedUpdateAll / whenNotMatchedInsertAll) with optimistic
    concurrency -- the 100 TB multi-writer path. Import-gated: raises
    ImportError with guidance when delta-spark isn't installed (it is
    not in this image; tests skip via importorskip). Size
    ``n_buckets`` so one bucket's rows fit executor memory at the
    target scale.
    """
    if precedence_col is not None:
        w = Window.partitionBy(key).orderBy(F.col(precedence_col).desc())
        updates = (
            updates.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    if fmt == "delta":
        try:
            from delta.tables import DeltaTable
        except ImportError as e:
            raise ImportError(
                "merge_into_table(fmt='delta') needs the delta-spark "
                "package and a Delta-enabled SparkSession "
                "(spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension); "
                "use fmt='parquet' for the copy-on-write path"
            ) from e
        if not DeltaTable.isDeltaTable(spark, path):
            updates.write.format("delta").mode("errorifexists").save(path)
            return
        (
            DeltaTable.forPath(spark, path).alias("b")
            .merge(updates.alias("u"), f"b.{key} = u.{key}")
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return
    if fmt != "parquet":
        raise ValueError(f"fmt must be 'parquet' or 'delta', got {fmt!r}")

    bucketed = updates.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )
    try:
        base = spark.read.parquet(path)
    except Exception as e:  # noqa: BLE001 -- only absent-path falls through
        if not _is_path_not_found(e):
            raise
        bucketed.write.mode("errorifexists").partitionBy("_bucket").parquet(
            path
        )
        return
    touched = sorted(
        r[0] for r in bucketed.select("_bucket").distinct().collect()
    )
    base_touched = base.filter(F.col("_bucket").isin(touched))
    merged = merge_by_key(base_touched, bucketed, key=key)
    merged.localCheckpoint(eager=True).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("_bucket").parquet(path)
