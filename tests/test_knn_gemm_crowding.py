"""The gemm path's local crowding prune is claimed EXACT (proof sketch
in operators/knn.py) -- verify against the declarative fold path on real
data with many partitions."""

from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators import knn_search
from rag_vertex_ai_vector_search_spark.sources import load_table


def test_gemm_crowding_matches_fold(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings").repartition(16)
    queries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    )
    kwargs = dict(k=10, per_crowding_k=2, crowding_col="label")
    fold = sorted(
        tuple(r)
        for r in knn_search(emb, queries, method="fold", **kwargs)
        .select("query_id", "rank", "neighbor_id", "label").collect()
    )
    gemm = sorted(
        tuple(r)
        for r in knn_search(emb, queries, method="gemm", **kwargs)
        .select("query_id", "rank", "neighbor_id", "label").collect()
    )
    assert fold == gemm


def test_winnow_pairs_find_copied_passage(spark):
    from rag_vertex_ai_vector_search_spark.operators.dedup import (
        winnow_candidate_pairs,
    )

    passage = (
        "this exact paragraph was copied verbatim between two documents "
        "and must be detected by the winnowing fingerprints"
    )
    rows = [
        (0, "intro text completely unlike the rest. " + passage),
        (1, passage + " plus a totally different conclusion section here"),
        (2, "unrelated document about query optimizers and join ordering"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b) for r in winnow_candidate_pairs(df).collect()}
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)
