"""Restrict predicates over map columns, LSH ANN, winnowing fingerprints."""

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.sources import load_table
from rag_vertex_ai_vector_search_spark.functions import winnowing_fingerprints
from rag_vertex_ai_vector_search_spark.operators import (
    ingest_documents,
    knn_search,
    lsh_topk,
    restrict_predicate,
)


def test_restrict_predicate_on_ingested_datapoints(spark, sf_smoke):
    """End-to-end Vertex-style restricts: build datapoints via ingest,
    filter with allow/deny/numeric clauses (SURVEY Q3/Q4)."""
    docs = load_table(spark, sf_smoke, "documents")
    dp = ingest_documents(docs, extra_restrict_cols=("lang",)).datapoints

    allow = dp.filter(restrict_predicate(allow={"lang": ["de", "es"]}))
    langs = {r[0] for r in allow.select(F.element_at("restricts", "lang")[0]).collect()}
    assert langs <= {"de", "es"} and langs

    deny = dp.filter(restrict_predicate(deny={"lang": ["de", "es"]}))
    assert allow.count() + deny.count() == dp.count()

    num = dp.filter(
        restrict_predicate(numeric_min={"content_length": 500},
                           numeric_max={"content_length": 1000})
    )
    vals = [
        r[0] for r in num.select(F.element_at("numeric_restricts", "content_length")).collect()
    ]
    assert vals and all(500 <= v <= 1000 for v in vals)

    # missing namespace excluded for allow, kept for deny
    assert dp.filter(restrict_predicate(allow={"nope": ["x"]})).count() == 0
    assert dp.filter(restrict_predicate(deny={"nope": ["x"]})).count() == dp.count()


@pytest.mark.full
def test_lsh_topk_recall_vs_exact(spark, sf_smoke):
    """LSH candidates are a subset; self-match must survive and recall
    on the reachable set should be reasonable even on random vectors."""
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    )
    approx = lsh_topk(emb, queries, k=5, n_planes=16, bands=8).collect()
    by_q = {}
    for r in approx:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(10))
    for qid, rows in by_q.items():
        best = min(rows, key=lambda r: r.rank)
        assert best.neighbor_id == qid  # identical vector collides in every band
        assert abs(best.score - 1.0) < 1e-6

    # approximate scores must be a subset of exact scores (no invention)
    exact = {
        (r.query_id, r.neighbor_id): r.score
        for r in knn_search(emb, queries, k=500, method="fold").collect()
    }
    for r in approx:
        assert abs(exact[(r.query_id, r.neighbor_id)] - r.score) < 1e-12


def test_winnowing_shared_substring(spark):
    """Docs sharing a long substring must share a fingerprint; disjoint
    docs (different alphabet) share none."""
    common = "the common shared passage that is long enough to fingerprint"
    rows = [
        (0, common + " plus unique tail alpha"),
        (1, "different head beta " + common),
        (2, "zzzz qqqq jjjj xxxx wwww vvvv kkkk"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {
        r.doc_id: set(r.fp)
        for r in df.select("doc_id", winnowing_fingerprints("text").alias("fp")).collect()
    }
    assert fps[0] & fps[1], "shared substring must produce shared fingerprints"
    assert not (fps[0] & fps[2])
    # deterministic across invocations
    again = {
        r.doc_id: set(r.fp)
        for r in df.select("doc_id", winnowing_fingerprints("text").alias("fp")).collect()
    }
    assert fps == again


def test_restrict_crowding_compose_over_all_ann_families(spark, sf_smoke):
    """Q3-Q5 through EVERY approximate path: at full cover (zero-plane
    LSH, 100% probe IVF2) restricted+crowded search must equal exact
    restricted+crowded kNN -- no family silently loses the serving
    contract when a user switches index types."""
    from pyspark.sql import functions as F

    from rag_vertex_ai_vector_search_spark.operators import knn_search, lsh_topk
    from rag_vertex_ai_vector_search_spark.operators.ivf2 import (
        build_ivf2_index,
        ivf2_search,
    )
    from rag_vertex_ai_vector_search_spark.sources import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    restrict = F.col("label").isin(0, 1, 2) & (F.col("vec_id") >= 30)
    queries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
    )
    cols = ("query_id", "rank", "neighbor_id", "score", "label")
    exact = sorted(
        tuple(r) for r in knn_search(
            emb, queries, k=8, restrict=restrict,
            per_crowding_k=2, crowding_col="label", method="fold",
        ).select(*cols).collect()
    )

    lsh = sorted(
        tuple(r) for r in lsh_topk(
            emb, queries, k=8, n_planes=0, bands=1,
            restrict=restrict, per_crowding_k=2, crowding_col="label",
        ).select(*cols).collect()
    )
    assert lsh == exact

    ivf2 = build_ivf2_index(emb, n_coarse=3, n_fine=3)
    hier = sorted(
        tuple(r) for r in ivf2_search(
            ivf2, queries, k=8,
            probe_coarse_percent=100.0, probe_fine_percent=100.0,
            restrict=restrict, per_crowding_k=2, crowding_col="label",
        ).select(*cols).collect()
    )
    assert hier == exact
