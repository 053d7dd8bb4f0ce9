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


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

def _word_stream(spark, counts: dict):
    rows = [(w,) for w, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "word string")


def test_cms_exact_when_wide(spark):
    """With width >> distinct items there are no collisions and the
    estimate IS the exact count."""
    from rag_vertex_ai_vector_search_spark.operators.sketch import (
        cms_point_estimate,
        cms_sketch,
    )

    counts = {"a": 7, "b": 3, "c": 12, "d": 1}
    df = _word_stream(spark, counts)
    counters = cms_sketch(df, "word", depth=4, width=1 << 12)
    items = spark.createDataFrame(
        [(w,) for w in [*counts, "never-seen"]], "item string"
    )
    est = {r.item: r.est for r in
           cms_point_estimate(counters, items, depth=4, width=1 << 12)
           .collect()}
    for w, n in counts.items():
        assert est[w] == n, (w, est[w], n)
    assert est["never-seen"] == 0  # absent counters count as zero


def test_cms_never_underestimates_under_collisions(spark):
    """Tiny width forces collisions: estimates may exceed but can
    never undershoot the true count (the CMS one-sided bound)."""
    from rag_vertex_ai_vector_search_spark.operators.sketch import (
        cms_point_estimate,
        cms_sketch,
    )

    counts = {f"w{i}": (i % 5) + 1 for i in range(50)}
    df = _word_stream(spark, counts)
    counters = cms_sketch(df, "word", depth=4, width=16)
    items = spark.createDataFrame([(w,) for w in counts], "item string")
    est = {r.item: r.est for r in
           cms_point_estimate(counters, items, depth=4, width=16).collect()}
    assert all(est[w] >= n for w, n in counts.items())
    assert any(est[w] > n for w, n in counts.items())  # collisions real


def test_cms_merge_is_linear(spark):
    """Sketch(A) + Sketch(B) == Sketch(A ++ B), counter for counter."""
    from rag_vertex_ai_vector_search_spark.operators.sketch import (
        cms_merge,
        cms_sketch,
    )

    a = _word_stream(spark, {"x": 5, "y": 2})
    b = _word_stream(spark, {"y": 4, "z": 1})
    merged = cms_merge(
        cms_sketch(a, "word", depth=3, width=64),
        cms_sketch(b, "word", depth=3, width=64),
    )
    direct = cms_sketch(a.unionByName(b), "word", depth=3, width=64)
    m = {(r.row, r.bucket): r.cnt for r in merged.collect()}
    d = {(r.row, r.bucket): r.cnt for r in direct.collect()}
    assert m == d


def test_cms_weighted(spark):
    """The weight column counts each row with its weight (token-count
    weighting of a per-document stream)."""
    from pyspark.sql import functions as F

    from rag_vertex_ai_vector_search_spark.operators.sketch import (
        cms_point_estimate,
        cms_sketch,
    )

    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 2)], "word string, w int"
    )
    counters = cms_sketch(
        df, "word", depth=3, width=256, weight=F.col("w")
    )
    items = spark.createDataFrame([("a",), ("b",)], "item string")
    est = {r.item: r.est for r in
           cms_point_estimate(counters, items, depth=3, width=256).collect()}
    assert est == {"a": 15, "b": 2}


@pytest.mark.full
def test_cms_partition_order_invariant(spark):
    """Integer counters admit no float drift: any partitioning gives
    the identical counter table."""
    from rag_vertex_ai_vector_search_spark.operators.sketch import (
        cms_sketch,
    )

    counts = {f"t{i}": i + 1 for i in range(30)}
    df = _word_stream(spark, counts)
    one = {(r.row, r.bucket): r.cnt for r in
           cms_sketch(df.coalesce(1), "word", depth=4, width=32).collect()}
    many = {(r.row, r.bucket): r.cnt for r in
            cms_sketch(df.repartition(16), "word", depth=4, width=32)
            .collect()}
    assert one == many


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_fp_bound(spark):
    """Every inserted item probes true (the Bloom guarantee); planted
    NON-members false-positive at well under the design rate for this
    load (k=3, n=2000, m=2^17 -> ~0.01%)."""
    from rag_vertex_ai_vector_search_spark.operators.sketch import (
        bloom_contains, bloom_sketch,
    )

    kw = dict(n_bits=1 << 17, k=3)
    members = _ids(spark, 2000, "in")
    words = bloom_sketch(members, "val", **kw)
    got_in = bloom_contains(
        words, members.select(F.col("val").alias("item")), **kw
    ).collect()
    assert len(got_in) == 2000
    assert all(r.might_contain for r in got_in)

    outs = _ids(spark, 5000, "out")
    got_out = bloom_contains(
        words, outs.select(F.col("val").alias("item")), **kw
    ).collect()
    fp = sum(r.might_contain for r in got_out)
    assert fp <= 5  # ~0.0001 expected; 10x slack

    # word table is bounded and every mask fits 32 positive bits
    rows = words.collect()
    assert len(rows) <= (1 << 17) // 32
    assert all(0 < r.bits <= (1 << 32) - 1 for r in rows)


def test_bloom_merge_equals_single_pass_and_grouped(spark):
    from rag_vertex_ai_vector_search_spark.operators.sketch import (
        bloom_merge, bloom_sketch,
    )

    kw = dict(n_bits=1 << 14, k=3)
    a = _ids(spark, 800, "x")
    b = spark.range(400, 1200).select(
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("val")
    )
    merged = bloom_merge(
        bloom_sketch(a, "val", **kw), bloom_sketch(b, "val", **kw)
    )
    direct = bloom_sketch(a.unionByName(b), "val", **kw)
    assert sorted((r.word, r.bits) for r in merged.collect()) == sorted(
        (r.word, r.bits) for r in direct.collect()
    )

    g = a.withColumn("g", F.lit("g1")).unionByName(
        _ids(spark, 100, "y").withColumn("g", F.lit("g2"))
    )
    gw = bloom_sketch(g, "val", group_cols=("g",), **kw)
    assert gw.select("g").distinct().count() == 2


def test_bloom_cardinality_estimate(spark):
    from rag_vertex_ai_vector_search_spark.operators.sketch import (
        bloom_cardinality, bloom_sketch,
    )

    kw = dict(n_bits=1 << 17, k=3)
    words = bloom_sketch(_ids(spark, 3000), "val", **kw)
    got = bloom_cardinality(words, **{k: v for k, v in kw.items()}).collect()[0]
    assert abs(got.estimate - 3000) / 3000 < 0.05
    # partition-order invariance of the integer popcount sum
    got2 = bloom_cardinality(
        bloom_sketch(_ids(spark, 3000).repartition(16), "val", **kw), **kw
    ).collect()[0]
    assert (got.n_set_bits, got.estimate) == (got2.n_set_bits, got2.estimate)


# ---------------------------------------------------------------------------
# Equi-width histogram
# ---------------------------------------------------------------------------

def test_histogram_counts_merge_and_clamp(spark):
    from rag_vertex_ai_vector_search_spark.operators.sketch import (
        histogram_merge, histogram_sketch,
    )

    kw = dict(lo=0, hi=100, n_bins=10)
    df = spark.createDataFrame(
        [(v,) for v in [-5, 0, 5, 9, 10, 55, 99, 100, 250]], "v long"
    )
    hist = {r.bin: r.cnt for r in histogram_sketch(df, "v", **kw).collect()}
    # -5 clamps into bin 0; 100 and 250 clamp into bin 9
    assert hist[0] == 4      # -5, 0, 5, 9
    assert hist[1] == 1      # 10
    assert hist[5] == 1      # 55
    assert hist[9] == 3      # 99, 100, 250
    assert sum(hist.values()) == 9

    a = spark.createDataFrame([(v,) for v in range(0, 50)], "v long")
    b = spark.createDataFrame([(v,) for v in range(50, 100)], "v long")
    merged = histogram_merge(
        histogram_sketch(a, "v", **kw), histogram_sketch(b, "v", **kw)
    )
    direct = histogram_sketch(a.unionByName(b), "v", **kw)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_histogram_quantiles_within_one_bin(spark):
    from rag_vertex_ai_vector_search_spark.operators.sketch import (
        histogram_quantiles, histogram_sketch,
    )

    kw = dict(lo=0, hi=1000, n_bins=100)
    df = spark.createDataFrame([(v,) for v in range(1000)], "v long")
    hist = histogram_sketch(df, "v", **kw)
    got = {
        (r.q_num, r.q_den): r
        for r in histogram_quantiles(
            hist, quantiles=((1, 2), (9, 10), (99, 100)), **kw
        ).collect()
    }
    # uniform 0..999: true p50=500, p90=900, p99=990; bin width 10
    assert abs(got[(1, 2)].q_value - 500) <= 10
    assert abs(got[(9, 10)].q_value - 900) <= 10
    assert abs(got[(99, 100)].q_value - 990) <= 10
    assert all(r.n_rows == 1000 for r in got.values())

    # partition-order invariance (pure integer cumulative sums)
    got2 = {
        (r.q_num, r.q_den): r.q_value
        for r in histogram_quantiles(
            histogram_sketch(df.repartition(16), "v", **kw),
            quantiles=((1, 2), (9, 10), (99, 100)), **kw
        ).collect()
    }
    assert got2 == {k: r.q_value for k, r in got.items()}


def test_histogram_grouped_quantiles(spark):
    from rag_vertex_ai_vector_search_spark.operators.sketch import (
        histogram_quantiles, histogram_sketch,
    )

    kw = dict(lo=0, hi=100, n_bins=50)
    rows = [("a", v) for v in range(0, 100)] + [("b", v) for v in range(0, 10)]
    df = spark.createDataFrame(rows, "g string, v long")
    hist = histogram_sketch(df, "v", group_cols=("g",), **kw)
    got = {
        (r.g, r.q_num, r.q_den): r.q_value
        for r in histogram_quantiles(
            hist, group_cols=("g",), quantiles=((1, 2),), **kw
        ).collect()
    }
    assert abs(got[("a", 1, 2)] - 50) <= 2
    assert abs(got[("b", 1, 2)] - 5) <= 2


def test_bloom_contains_rejects_grouped_word_table(spark):
    """bloom_contains guards against a multi-sketch word table (the
    probe join would fan out across groups and silently OR filters
    together); filtering to one group first is the documented fix."""
    from rag_vertex_ai_vector_search_spark.operators.sketch import (
        bloom_contains, bloom_sketch,
    )

    kw = dict(n_bits=1 << 14, k=3)
    g = _ids(spark, 50, "x").withColumn("g", F.lit("g1")).unionByName(
        _ids(spark, 50, "y").withColumn("g", F.lit("g2"))
    )
    grouped = bloom_sketch(g, "val", group_cols=("g",), **kw)
    probes = _ids(spark, 5, "x").select(F.col("val").alias("item"))
    with pytest.raises(ValueError, match="ONE logical sketch"):
        bloom_contains(grouped, probes, **kw)
    # filtered to a single group the same table probes fine (and keeps
    # the no-false-negative guarantee for that group's members)
    one = grouped.filter(F.col("g") == "g1").drop("g")
    got = bloom_contains(one, probes, **kw).collect()
    assert len(got) == 5 and all(r.might_contain for r in got)
