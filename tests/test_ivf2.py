"""Two-level IVF: full-probe exactness, hierarchical recall, layout."""

import numpy as np
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators import knn_search
from rag_vertex_ai_vector_search_spark.operators.ivf2 import (
    build_ivf2_index,
    ivf2_search,
)
from rag_vertex_ai_vector_search_spark.sources import load_table
import pytest


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _recall(approx, exact):
    hits = sum(len(approx.get(q, set()) & s) for q, s in exact.items())
    return hits / sum(len(s) for s in exact.values())


def test_ivf2_full_probe_is_exact(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
    )
    k = 10
    exact = knn_search(emb, queries, k=k, method="fold").select(
        "query_id", "rank", "neighbor_id", "score"
    )
    index = build_ivf2_index(emb, n_coarse=4, n_fine=4)
    full = ivf2_search(
        index, queries, k=k,
        probe_coarse_percent=100.0, probe_fine_percent=100.0,
    )
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, exact.collect())
    )  # scores bit-equal too: same fold scorer


def test_ivf2_leaf_ids_cover_both_levels(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    index = build_ivf2_index(emb, n_coarse=4, n_fine=4)
    rows = index.assigned.select("coarse_id", "cluster_id").distinct().collect()
    for r in rows:
        assert 0 <= r.coarse_id < 4
        assert r.cluster_id // 4 == r.coarse_id  # leaf id encodes coarse
    # hierarchy actually splits: more leaves than coarse buckets
    assert len({r.cluster_id for r in rows}) > len({r.coarse_id for r in rows})


@pytest.mark.full
def test_ivf2_recall_on_two_level_structure(spark):
    """Planted hierarchy (coarse super-clusters, fine sub-clusters):
    hierarchical probing at 50/50 keeps recall@10 >= 0.85."""
    rng = np.random.RandomState(31)
    rows, vid = [], 0
    for _ in range(4):  # super-clusters
        sup = rng.randn(24)
        sup /= np.linalg.norm(sup)
        for _ in range(4):  # sub-clusters
            sub = sup + 0.3 * rng.randn(24)
            sub /= np.linalg.norm(sub)
            for _ in range(15):
                v = sub + 0.1 * rng.randn(24)
                v /= np.linalg.norm(v)
                rows.append((vid, [float(x) for x in v]))
                vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") % 15 == 6).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
    )
    k = 10
    exact = _topk_sets(knn_search(emb, queries, k=k, method="fold").collect())
    index = build_ivf2_index(emb, n_coarse=4, n_fine=4, sample_rows=240)
    got = _topk_sets(ivf2_search(
        index, queries, k=k,
        probe_coarse_percent=50.0, probe_fine_percent=50.0,
    ).collect())
    assert _recall(got, exact) >= 0.85
