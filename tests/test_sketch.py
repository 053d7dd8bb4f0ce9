"""HyperLogLog register-table sketches (operators/sketch.py):
accuracy vs exact distinct, mergeability, and the exact-integer
harmonic sum that makes the estimator order-independent."""

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.sketch import (
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_sketch,
)


def _ids(spark, n, prefix="v", group=None):
    df = spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("val")
    )
    if group is not None:
        df = df.withColumn("g", F.lit(group))
    return df


@pytest.mark.parametrize("n,p,tol", [(100, 10, 0.10), (5000, 10, 0.08),
                                     (50000, 12, 0.05)])
def test_hll_accuracy_within_standard_error(spark, n, p, tol):
    """|estimate - n| within a few standard errors (1.04/sqrt(m))."""
    est = hll_distinct(_ids(spark, n), "val", p=p).collect()[0].estimate
    assert abs(est - n) / n < tol, (est, n)


def test_hll_merge_equals_single_pass(spark):
    """Register-wise MAX merge of shard sketches == the sketch of the
    union -- the property that makes sketches reusable across days."""
    a = _ids(spark, 3000, "x")
    b = spark.range(1500, 4500).select(
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("val")
    )  # overlapping shard
    merged = hll_merge(
        hll_sketch(a, "val", p=10), hll_sketch(b, "val", p=10)
    )
    direct = hll_sketch(a.unionByName(b), "val", p=10)
    m = {(r.bucket): r.max_rho for r in merged.collect()}
    d = {(r.bucket): r.max_rho for r in direct.collect()}
    assert m == d
    est = hll_estimate(merged, p=10).collect()[0].estimate
    assert abs(est - 4500) / 4500 < 0.10


def test_hll_grouped_and_order_independent(spark):
    """Per-group sketches; estimate invariant to partitioning (the
    integer harmonic sum admits no float reassociation drift)."""
    df = _ids(spark, 2000, "a", group="g1").unionByName(
        _ids(spark, 300, "b", group="g2")
    )
    one = {
        r.g: r.estimate
        for r in hll_distinct(
            df.coalesce(1), "val", group_cols=("g",), p=10
        ).collect()
    }
    many = {
        r.g: r.estimate
        for r in hll_distinct(
            df.repartition(32), "val", group_cols=("g",), p=10
        ).collect()
    }
    assert one == many
    assert abs(one["g1"] - 2000) / 2000 < 0.10
    assert abs(one["g2"] - 300) / 300 < 0.12


def test_hll_xxhash64_production_path(spark):
    """The cheaper non-oracle hash gives the same machinery and
    comparable accuracy."""
    est = hll_distinct(
        _ids(spark, 10000), "val", p=10, base_hash="xxhash64"
    ).collect()[0].estimate
    assert abs(est - 10000) / 10000 < 0.10


def test_hll_small_range_linear_counting(spark):
    """Tiny cardinalities ride the linear-counting correction and stay
    near-exact."""
    est = hll_distinct(_ids(spark, 12), "val", p=10).collect()[0].estimate
    assert abs(est - 12) <= 2


def test_hll_register_bounds(spark):
    """Registers respect the geometry: bucket < 2^p, 1 <= rho <= w+1,
    at most min(2^p, distinct) occupied."""
    regs = hll_sketch(_ids(spark, 1000), "val", p=8).collect()
    assert len(regs) <= 256
    assert all(0 <= r.bucket < 256 for r in regs)
    assert all(1 <= r.max_rho <= 53 for r in regs)
