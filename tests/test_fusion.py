"""Reciprocal-rank fusion properties."""

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.fusion import (
    reciprocal_rank_fusion,
)


def _ranked(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, neighbor_id long, rank long"
    )


def test_rrf_scores_and_missing_sources(spark):
    a = _ranked(spark, [(1, 10, 1), (1, 11, 2)])
    b = _ranked(spark, [(1, 11, 1), (1, 12, 2)])
    out = {r.neighbor_id: r for r in
           reciprocal_rank_fusion({"a": a, "b": b}, k=60).collect()}
    # 11 appears in both (rank 2 in a, rank 1 in b) -> highest fused
    assert out[11].rrf_score == pytest.approx(1 / 62 + 1 / 61)
    assert out[10].rrf_score == pytest.approx(1 / 61)
    assert out[12].rrf_score == pytest.approx(1 / 62)
    assert [out[i].rank for i in (11, 10, 12)] == [1, 2, 3]
    # missing-source contribution is null pre-coalesce; score treats as 0
    assert out[10].rrf_b is None and out[12].rrf_a is None


def test_rrf_three_sources_deterministic(spark):
    rows = [(1, i, i) for i in range(1, 30)]
    srcs = {
        "s1": _ranked(spark, rows),
        "s2": _ranked(spark, [(1, i, 30 - i) for i in range(1, 30)]),
        "s3": _ranked(spark, [(1, i, (i * 7) % 29 + 1) for i in range(1, 30)]),
    }
    r1 = sorted(map(tuple, reciprocal_rank_fusion(srcs).collect()))
    r2 = sorted(map(tuple, reciprocal_rank_fusion(srcs).collect()))
    assert r1 == r2  # fixed-order contribution sum, no shuffle-order drift


def test_rrf_rejects_empty(spark):
    with pytest.raises(ValueError):
        reciprocal_rank_fusion({})
