"""Size-based strategy auto-switch (method="auto") for the query side
of knn/ivf/pq search: at or under the threshold the driver-broadcast
fast path runs; above it the collect-free cogroup path is chosen
automatically -- the caller no longer has to know their query scale to
get the scale-safe plan.
"""

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.sources import load_table
from rag_vertex_ai_vector_search_spark.operators import knn_search
from rag_vertex_ai_vector_search_spark.operators.ivf import (
    build_ivf_index,
    ivf_search,
)
from rag_vertex_ai_vector_search_spark.operators.pq import (
    encode_pq,
    pq_search_rerank,
    train_pq,
)


def _queries(emb, n=6):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
    )


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.full
def test_knn_auto_picks_gemm_small_cogroup_large(spark, sf_smoke, monkeypatch):
    """Below the threshold auto resolves to the broadcast GEMM plan;
    above it to the cogroup plan -- proven by plan shape AND by
    monkeypatching every driver-materialization method (the large side
    must build and execute without a single query-side collect)."""
    from pyspark.sql.classic.dataframe import DataFrame

    emb = load_table(spark, sf_smoke, "embeddings")
    queries = _queries(emb)

    small = knn_search(emb, queries, k=5, method="auto", auto_threshold=100)
    p_small = _plan(small)
    assert "MapInPandas" in p_small
    assert "FlatMapCoGroupsInPandas" not in p_small

    def boom(self, *a, **kw):
        raise AssertionError("driver-side materialization on the auto-cogroup path")

    for meth in ("collect", "take", "first", "toPandas", "toLocalIterator"):
        monkeypatch.setattr(DataFrame, meth, boom)
    large = knn_search(emb, queries, k=5, method="auto", auto_threshold=2)
    assert "FlatMapCoGroupsInPandas" in _plan(large)
    large.foreach(lambda r: None)  # executes end-to-end, no collect


@pytest.mark.full
def test_knn_auto_results_invariant_across_threshold(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = _queries(emb)
    cols = ("query_id", "rank", "neighbor_id", "score")
    lo = sorted(
        tuple(r) for r in knn_search(
            emb, queries, k=7, method="auto", auto_threshold=2
        ).select(*cols).collect()
    )
    hi = sorted(
        tuple(r) for r in knn_search(
            emb, queries, k=7, method="auto", auto_threshold=1000
        ).select(*cols).collect()
    )
    assert lo == hi


@pytest.mark.full
def test_ivf_auto_results_invariant_and_cogroup_plan(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = _queries(emb)
    index = build_ivf_index(emb, n_clusters=8)
    cols = ("query_id", "rank", "neighbor_id", "score")
    lo = sorted(
        tuple(r) for r in ivf_search(
            index, queries, k=7, probe_percent=100.0, auto_threshold=2
        ).select(*cols).collect()
    )
    hi = sorted(
        tuple(r) for r in ivf_search(
            index, queries, k=7, probe_percent=100.0, auto_threshold=1000
        ).select(*cols).collect()
    )
    assert lo == hi
    big = ivf_search(index, queries, k=7, probe_percent=100.0,
                     auto_threshold=2)
    assert "FlatMapCoGroupsInPandas" in _plan(big)


@pytest.mark.full
def test_pq_auto_results_invariant_and_no_collect_above(
    spark, sf_smoke, monkeypatch
):
    from pyspark.sql.classic.dataframe import DataFrame

    emb = load_table(spark, sf_smoke, "embeddings")
    queries = _queries(emb)
    books = train_pq(emb, m=8, ksub=32, iters=4, sample_rows=500)
    index = encode_pq(emb, books)
    cols = ("query_id", "rank", "neighbor_id")
    lo = sorted(
        tuple(r) for r in pq_search_rerank(
            index, emb, queries, k=5, auto_threshold=2
        ).select(*cols).collect()
    )
    hi = sorted(
        tuple(r) for r in pq_search_rerank(
            index, emb, queries, k=5, auto_threshold=1000
        ).select(*cols).collect()
    )
    assert lo == hi

    def boom(self, *a, **kw):
        raise AssertionError("driver-side materialization on the auto-cogroup path")

    for meth in ("collect", "take", "first", "toPandas", "toLocalIterator"):
        monkeypatch.setattr(DataFrame, meth, boom)
    big = pq_search_rerank(index, emb, queries, k=5, auto_threshold=2)
    assert "FlatMapCoGroupsInPandas" in _plan(big)
    big.foreach(lambda r: None)
