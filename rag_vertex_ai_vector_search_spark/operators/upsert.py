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
