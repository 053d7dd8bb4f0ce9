"""Import + minimal end-to-end smoke for every module."""

from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.sources import load_table, load_tables
from rag_vertex_ai_vector_search_spark.functions import (
    dot_product,
    hash_embedding_numpy,
    token_count,
)
from rag_vertex_ai_vector_search_spark.operators import knn_search


def test_tables_load(spark, sf_smoke):
    tables = load_tables(spark, sf_smoke)
    assert set(tables) >= {"lineitem", "documents", "embeddings"}
    assert tables["lineitem"].count() > 0


def test_hash_embedding_deterministic():
    a = hash_embedding_numpy("hello", 16)
    b = hash_embedding_numpy("hello", 16)
    assert (a == b).all()
    assert abs(float((a.astype("float64") ** 2).sum()) - 1.0) < 1e-5


def test_knn_fold_smoke(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    )
    out = knn_search(emb, queries, k=5, method="fold").collect()
    assert len(out) == 15
    # self-similarity must rank first for unit-ish vectors
    by_query = {}
    for r in out:
        by_query.setdefault(r.query_id, []).append(r)
    for qid, rows in by_query.items():
        rows.sort(key=lambda r: r.rank)
        assert rows[0].neighbor_id == qid


def test_knn_gemm_matches_fold(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    )
    fold = knn_search(emb, queries, k=10, method="fold").select(
        "query_id", "rank", "neighbor_id"
    ).collect()
    gemm = knn_search(emb, queries, k=10, method="gemm").select(
        "query_id", "rank", "neighbor_id"
    ).collect()
    assert sorted(map(tuple, fold)) == sorted(map(tuple, gemm))


def test_run_log_sink(tmp_path):
    """Reference setup_logging analog (setup_vector_search.py:218-232):
    timestamped file under the log dir, reference record format."""
    import logging
    import os

    from rag_vertex_ai_vector_search_spark.plans.run_log import setup_run_logging

    log_dir = str(tmp_path / "log")
    path = setup_run_logging(log_dir, prefix="t", stream=False)
    try:
        assert os.path.dirname(path) == log_dir
        logging.getLogger("engine.test").info("index build started")
        for h in logging.getLogger().handlers:
            h.flush()
        content = open(path).read()
        assert "INFO - engine.test - index build started" in content
    finally:
        root = logging.getLogger()
        for h in list(root.handlers):
            root.removeHandler(h)
            h.close()
