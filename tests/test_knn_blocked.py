"""Blocked-query GEMM kNN must equal the single-shot paths exactly."""

from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.knn import (
    knn_search,
    knn_search_blocked,
)
from rag_vertex_ai_vector_search_spark.sources import load_table


def test_blocked_equals_fold(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    )
    fold = sorted(
        tuple(r) for r in knn_search(emb, queries, k=7, method="fold")
        .select("query_id", "rank", "neighbor_id").collect()
    )
    blocked = sorted(
        tuple(r) for r in knn_search_blocked(
            emb, queries, k=7, max_queries_per_block=9
        ).select("query_id", "rank", "neighbor_id").collect()
    )
    assert blocked == fold
    assert len({q for q, _, _ in blocked}) == 40  # every block answered
