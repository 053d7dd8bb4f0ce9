"""salted_join: result equality with the plain join, salt spread."""

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.skew import salted_join


def _skewed(spark):
    # one catastrophic hot key (0) + a long tail
    left = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, 0).otherwise(F.col("id") % 50)
        .cast("long").alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(50)], "k long, name string"
    )
    return left, right


def test_salted_inner_join_equals_plain(spark):
    left, right = _skewed(spark)
    plain = sorted(map(tuple, left.join(right, "k").collect()))
    salted = sorted(map(tuple, salted_join(left, right, "k", factor=8).collect()))
    assert salted == plain


def test_salted_left_join_equals_plain(spark):
    left, right = _skewed(spark)
    right_holes = right.filter(F.col("k") % 3 == 0)  # unmatched left rows
    plain = sorted(map(tuple, left.join(right_holes, "k", "left").collect()))
    salted = sorted(map(tuple,
        salted_join(left, right_holes, "k", factor=4, how="left").collect()))
    assert salted == plain


def test_hot_key_spreads_over_salt_partitions(spark):
    left, _ = _skewed(spark)
    from rag_vertex_ai_vector_search_spark.operators.skew import salted_join as sj  # noqa: F401

    salted = left.withColumn(
        "_salt", F.pmod(F.xxhash64("payload"), F.lit(8)).cast("int")
    )
    spread = (
        salted.filter(F.col("k") == 0)
        .groupBy("_salt").count().collect()
    )
    assert len(spread) == 8  # the hot key's 9000 rows use every salt
    assert max(r["count"] for r in spread) < 9_000 * 0.25


def test_rejects_outer_modes(spark):
    left, right = _skewed(spark)
    with pytest.raises(ValueError, match="inner.*left"):
        salted_join(left, right, "k", how="full")
