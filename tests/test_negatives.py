"""Hard-negative mining (operators/negatives.py): positives excluded,
ranking preserved, composition over real fixture embeddings."""

from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.negatives import (
    mine_hard_negatives,
)
from rag_vertex_ai_vector_search_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_mined_negatives_are_top_nonpositives(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
    )
    # positives: the query itself (always rank 1 under dot self-sim on
    # this fixture) plus one planted id
    positives = spark.createDataFrame(
        [(q, p) for q in range(3) for p in (q, q + 100)],
        "query_id long, pos_id long",
    )
    from rag_vertex_ai_vector_search_spark.operators.knn import knn_search

    exact = knn_search(emb, queries, 30, method="fold")
    negs = mine_hard_negatives(
        emb, queries, positives, n_negatives=5, k_fetch=30, method="fold"
    )
    got = {
        q: [r.neighbor_id for r in sorted(
            negs.collect(), key=lambda r: (r.query_id, r.neg_rank)
        ) if r.query_id == q]
        for q in range(3)
    }
    ref_rows = sorted(exact.collect(), key=lambda r: (r.query_id, r.rank))
    for q in range(3):
        banned = {q, q + 100}
        expect = [
            r.neighbor_id for r in ref_rows
            if r.query_id == q and r.neighbor_id not in banned
        ][:5]
        assert got[q] == expect
        assert not (set(got[q]) & banned)
    assert all(len(v) == 5 for v in got.values())
