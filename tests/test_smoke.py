"""Import + minimal end-to-end smoke for every module."""

from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.sources import load_table, load_tables
from rag_vertex_ai_vector_search_spark.functions import (
    dot_product,
    hash_embedding_numpy,
    token_count,
)
from rag_vertex_ai_vector_search_spark.operators import knn_search
import pytest


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


@pytest.mark.full
def test_knn_metric_variants_match_numpy(spark):
    """Cosine and squared-L2 search agree with a numpy brute force on
    NON-normalized vectors (where dot-product ranking provably
    differs), across the fold and gemm strategies."""
    import numpy as np
    from pyspark.sql import functions as F

    from rag_vertex_ai_vector_search_spark.operators.knn import (
        knn_search, knn_search_cosine, knn_search_l2,
    )

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(60, 8)) * rng.uniform(0.2, 5.0, size=(60, 1))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qn = 4
    queries = df.filter(F.col("vec_id") < qn).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
    )
    k = 5

    def ref_topk(score_fn, largest):
        out = {}
        for q in range(qn):
            s = np.array([score_fn(vecs[q], v) for v in vecs])
            order = np.lexsort((np.arange(60), -s if largest else s))
            out[q] = [int(i) for i in order[:k]]
        return out

    cos_ref = ref_topk(
        lambda a, b: a @ b / (np.linalg.norm(a) * np.linalg.norm(b)), True
    )
    l2_ref = ref_topk(lambda a, b: ((a - b) ** 2).sum(), False)
    dot_ref = ref_topk(lambda a, b: a @ b, True)
    # sanity: metrics genuinely disagree on this data
    assert cos_ref != dot_ref and l2_ref != dot_ref

    for method in ("fold", "gemm"):
        cos = knn_search_cosine(df, queries, k, method=method)
        got = {
            q: [r.neighbor_id for r in sorted(
                cos.collect(), key=lambda r: (r.query_id, r.rank)
            ) if r.query_id == q]
            for q in range(qn)
        }
        assert got == cos_ref, f"cosine/{method}"
        l2 = knn_search_l2(df, queries, k, method=method)
        got = {
            q: [r.neighbor_id for r in sorted(
                l2.collect(), key=lambda r: (r.query_id, r.rank)
            ) if r.query_id == q]
            for q in range(qn)
        }
        assert got == l2_ref, f"l2/{method}"

    # returned scores are the true metric values
    row = knn_search_l2(df, queries, k, method="fold").collect()[0]
    d = ((vecs[row.query_id] - vecs[row.neighbor_id]) ** 2).sum()
    assert abs(row.score - d) < 1e-9
    row = knn_search_cosine(df, queries, k, method="fold").collect()[0]
    c = vecs[row.query_id] @ vecs[row.neighbor_id] / (
        np.linalg.norm(vecs[row.query_id])
        * np.linalg.norm(vecs[row.neighbor_id])
    )
    assert abs(row.score - c) < 1e-9
