"""Interval join vs naive range predicate; GEMM cosine dedup vs fold."""

from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.dedup import (
    embedding_cosine_pairs,
    embedding_cosine_pairs_gemm,
)
from rag_vertex_ai_vector_search_spark.operators.range_join import interval_join
from rag_vertex_ai_vector_search_spark.sources import load_table
import pytest


@pytest.mark.full
def test_interval_join_matches_naive(spark):
    points = spark.createDataFrame(
        [(i, float(i * 3 % 97)) for i in range(60)], "pid long, x double"
    )
    intervals = spark.createDataFrame(
        [(j, float(j * 7 % 50), float(j * 7 % 50 + j % 13)) for j in range(40)],
        "iid long, lo double, hi double",
    )
    fast = {
        (r.pid, r.iid)
        for r in interval_join(points, intervals, "x", "lo", "hi", bucket_width=8)
        .select("pid", "iid").collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in points.crossJoin(intervals)
        .filter((F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")))
        .select("pid", "iid").collect()
    }
    assert fast == naive and naive  # non-trivial and exact


def test_interval_join_with_key(spark):
    points = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 5.0)], "pid long, k string, x double"
    )
    intervals = spark.createDataFrame(
        [(10, "a", 0.0, 9.0)], "iid long, k string, lo double, hi double"
    )
    out = interval_join(
        points, intervals, "x", "lo", "hi", bucket_width=4, extra_key="k"
    ).collect()
    assert [(r.pid, r.iid) for r in out] == [(1, 10)]


def test_cosine_gemm_matches_fold(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    fold = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_cosine_pairs(emb, block_col="label", threshold=0.5).collect()
    }
    gemm = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_cosine_pairs_gemm(
            emb, block_col="label", threshold=0.5
        ).collect()
    }
    assert set(fold) == set(gemm)
    assert all(abs(fold[p] - gemm[p]) < 1e-9 for p in fold)


def test_interval_join_left_outer_keeps_unmatched(spark):
    """how='left' must surface unmatched points as null-extended rows
    (the range predicate lives in the join condition, not a post-filter
    that would drop every null-extended row)."""
    from rag_vertex_ai_vector_search_spark.operators.range_join import (
        interval_join,
    )

    points = spark.createDataFrame(
        [(1, 5), (2, 15), (3, 99)], "pid long, point long"
    )
    intervals = spark.createDataFrame(
        [(100, 0, 9), (200, 10, 19)], "iid long, istart long, iend long"
    )
    out = interval_join(
        points, intervals, "point", "istart", "iend",
        bucket_width=10, how="left",
    ).select("pid", "point", "iid").collect()
    got = {(r.pid, r.iid) for r in out}
    assert got == {(1, 100), (2, 200), (3, None)}
    assert len(out) == 3  # unmatched point exactly once, no bucket dupes


def test_interval_join_inner_unchanged(spark):
    from rag_vertex_ai_vector_search_spark.operators.range_join import (
        interval_join,
    )

    points = spark.createDataFrame(
        [(1, 5), (2, 15), (3, 99)], "pid long, point long"
    )
    intervals = spark.createDataFrame(
        [(100, 0, 9), (200, 10, 19), (300, 4, 16)],
        "iid long, istart long, iend long",
    )
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            points, intervals, "point", "istart", "iend", bucket_width=10
        ).select("pid", "iid").collect()
    }
    assert got == {(1, 100), (1, 300), (2, 200), (2, 300)}
