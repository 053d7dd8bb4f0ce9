"""DSIR importance resampling (operators/importance.py) and the
recall@k evaluation loop (operators/evaluate.py)."""

import math

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.importance import (
    LOG_SCALE,
    dsir_gumbel_select,
    dsir_log_importance,
    hashed_gram_bucket_counts,
)
from rag_vertex_ai_vector_search_spark.operators.evaluate import (
    recall_report,
    recall_summary,
)


def _sha60(s: str) -> int:
    import hashlib

    return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)


def _grams(text: str) -> list[str]:
    ws = text.lower().split()
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def test_bucket_counts_match_python_reference(spark):
    rows = [(1, "alpha beta gamma"), (2, "beta beta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.bucket: r.n
        for r in hashed_gram_bucket_counts(df, n_buckets=64).collect()
    }
    ref = {}
    for _, t in rows:
        for g in _grams(t):
            b = _sha60(g) % 64
            ref[b] = ref.get(b, 0) + 1
    assert out == ref


def test_dsir_weights_match_python_reference(spark):
    """Exact micronat equality against a driver-side recomputation of
    the DSIR log ratio (target model vs raw model, add-alpha)."""
    raw_rows = [
        (1, "the cat sat on the mat"),
        (2, "stock market prices fell sharply today"),
        (3, "the dog sat on the rug"),
    ]
    tgt_rows = [(10, "the cat sat quietly"), (11, "the dog sat down")]
    B, alpha = 256, 0.5
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in dsir_log_importance(
            raw, tgt, n_buckets=B, alpha=alpha
        ).collect()
    }

    raw_counts, tgt_counts = {}, {}
    for _, t in raw_rows:
        for g in _grams(t):
            b = _sha60(g) % B
            raw_counts[b] = raw_counts.get(b, 0) + 1
    for _, t in tgt_rows:
        for g in _grams(t):
            b = _sha60(g) % B
            tgt_counts[b] = tgt_counts.get(b, 0) + 1
    dr = sum(raw_counts.values()) + alpha * B
    dt = sum(tgt_counts.values()) + alpha * B
    for doc_id, t in raw_rows:
        grams = _grams(t)
        total = 0
        for g in grams:
            b = _sha60(g) % B
            pt = (tgt_counts.get(b, 0) + alpha) / dt
            pr = (raw_counts.get(b, 0) + alpha) / dr
            total += math.floor(
                (math.log(pt) - math.log(pr)) * LOG_SCALE
            )
        row = out[doc_id]
        assert row.n_grams == len(grams)
        assert row.log_weight_micronats == total
        assert row.avg_log_weight_nats == pytest.approx(
            total / (LOG_SCALE * len(grams))
        )


def test_dsir_separates_target_like_docs(spark):
    """Docs sharing the target's vocabulary must outscore docs from a
    disjoint vocabulary -- the selection signal DSIR exists for."""
    target = spark.createDataFrame(
        [(100 + i, "science physics theorem proof lemma") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(1, "physics theorem proof"),          # target-like
         (2, "celebrity gossip fashion scandal"),  # off-target
         (3, "science lemma proof theorem")],   # target-like
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.avg_log_weight_nats
        for r in dsir_log_importance(raw, target, n_buckets=512).collect()
    }
    assert out[1] > out[2] and out[3] > out[2]
    assert out[2] < 0  # off-target text is anti-correlated with target


def test_dsir_gumbel_select_deterministic_and_weighted(spark):
    """Selection is reproducible, exactly n_keep rows, re-rolls under a
    different salt, and favors high-weight docs overwhelmingly when the
    weight gap is large."""
    rows = [(i, 0 if i < 50 else 40 * LOG_SCALE) for i in range(60)]
    scored = spark.createDataFrame(
        rows, "doc_id long, log_weight_micronats long"
    )
    sel1 = sorted(
        r.doc_id for r in dsir_gumbel_select(scored, 10).collect()
    )
    sel2 = sorted(
        r.doc_id for r in dsir_gumbel_select(scored, 10).collect()
    )
    assert sel1 == sel2 and len(sel1) == 10
    # weight gap of 40 nats: the 10 heavy docs win essentially surely
    assert all(i >= 50 for i in sel1)
    sel3 = sorted(
        r.doc_id
        for r in dsir_gumbel_select(scored, 10, salt="other").collect()
    )
    assert len(sel3) == 10  # re-roll keeps size (set may differ)


def test_recall_report_values(spark):
    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21), (3, 30)],
        "query_id long, neighbor_id long",
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (1, 12), (2, 20), (2, 21), (4, 40)],
        "query_id long, neighbor_id long",
    )
    out = {r.query_id: r for r in recall_report(approx, exact).collect()}
    assert out[1].n_hits == 2 and out[1].recall == pytest.approx(2 / 3)
    assert out[2].recall == 1.0
    # query 3: truth exists, approx returned nothing
    assert (out[3].n_approx, out[3].n_hits, out[3].recall) == (0, 0, 0.0)
    # query 4: approx-only (no truth) reports recall 0 over empty truth
    assert (out[4].n_exact, out[4].recall) == (0, 0.0)

    s = recall_summary(recall_report(approx, exact)).collect()[0]
    assert s.n_queries == 4
    # integer-sum micro recall: hits (2 + 2 + 0 + 0) / truth (3+2+1+0)
    assert (s.sum_hits, s.sum_exact) == (4, 6)
    assert s.micro_recall == pytest.approx(4 / 6)
    assert s.min_recall == 0.0
    assert (s.n_perfect, s.frac_perfect) == (1, pytest.approx(1 / 4))


@pytest.mark.full
def test_recall_report_on_real_ann_path(spark):
    """End-to-end: LSH vs exact kNN on the fixture embeddings -- the
    report's recall equals a driver-side set computation, and the
    full-cover configuration scores exactly 1.0 everywhere."""
    from rag_vertex_ai_vector_search_spark.operators import lsh_topk
    from rag_vertex_ai_vector_search_spark.operators.knn import knn_search
    from rag_vertex_ai_vector_search_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = (
        emb.filter(F.col("vec_id") < 4)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vector"),
        )
    )
    exact = knn_search(emb, queries, k=10, method="fold")
    approx = lsh_topk(emb, queries, k=10, n_planes=16, bands=8)
    rep = {r.query_id: r for r in recall_report(approx, exact).collect()}
    ex = {
        q: {r.neighbor_id for r in exact.collect() if r.query_id == q}
        for q in rep
    }
    ap = {
        q: {r.neighbor_id for r in approx.collect() if r.query_id == q}
        for q in rep
    }
    for q, row in rep.items():
        assert row.recall == pytest.approx(
            len(ex[q] & ap[q]) / len(ex[q])
        )
    # zero-plane cover == exact: recall 1.0 for every query
    full = lsh_topk(emb, queries, k=10, n_planes=0, bands=1)
    s = recall_summary(recall_report(full, exact)).collect()[0]
    assert s.micro_recall == 1.0 and s.frac_perfect == 1.0


def test_ranking_metrics_hand_values(spark):
    """MRR / DCG / nDCG against a hand-computed example."""
    import math

    from rag_vertex_ai_vector_search_spark.operators.evaluate import (
        ranking_metrics,
    )

    results = spark.createDataFrame(
        [("q1", n, r) for r, n in enumerate(["a", "b", "c", "d"], start=1)]
        + [("q2", n, r) for r, n in enumerate(["x", "y"], start=1)],
        "query_id string, neighbor_id string, rank long",
    )
    qrels = spark.createDataFrame(
        [("q1", "b", 2.0), ("q1", "d", 1.0), ("q1", "zzz", 3.0)],
        "query_id string, neighbor_id string, rel double",
    )
    out = {r.query_id: r for r in
           ranking_metrics(results, qrels, k=10).collect()}

    q1 = out["q1"]
    assert q1.n_rel == 3          # qrels-wide, incl. the unretrieved zzz
    assert q1.first_rel_rank == 2
    assert q1.rr == 0.5
    dcg = (2 ** 2 - 1) / math.log2(3) + (2 ** 1 - 1) / math.log2(5)
    # standard IDCG: ideal ordering over ALL judged relevant docs
    # (zzz rel=3 included even though never retrieved), truncated at k
    idcg = (
        (2 ** 3 - 1) / math.log2(2)
        + (2 ** 2 - 1) / math.log2(3)
        + (2 ** 1 - 1) / math.log2(4)
    )
    assert abs(q1.dcg - dcg) < 1e-12
    assert abs(q1.idcg - idcg) < 1e-12
    assert abs(q1.ndcg - dcg / idcg) < 1e-12
    assert q1.ndcg < 1.0  # missing a judged-relevant doc costs nDCG

    q2 = out["q2"]               # nothing relevant retrieved or known
    assert q2.n_rel == 0 and q2.first_rel_rank is None
    assert q2.rr == 0.0 and q2.ndcg == 0.0


def test_ranking_metrics_perfect_ranking_is_1(spark):
    from rag_vertex_ai_vector_search_spark.operators.evaluate import (
        ranking_metrics,
    )

    results = spark.createDataFrame(
        [("q", "a", 1), ("q", "b", 2), ("q", "c", 3)],
        "query_id string, neighbor_id string, rank long",
    )
    qrels = spark.createDataFrame(
        [("q", "a", 3.0), ("q", "b", 2.0), ("q", "c", 1.0)],
        "query_id string, neighbor_id string, rel double",
    )
    [r] = ranking_metrics(results, qrels, k=3).collect()
    assert r.rr == 1.0
    assert abs(r.ndcg - 1.0) < 1e-12


@pytest.mark.full
def test_dim_prefix_recall_curve_monotone_anchor(spark):
    """Full-dim row must be exactly 1.0 (approx == truth); the curve
    is monotone non-decreasing in L on nested-structure data."""
    import numpy as np

    from rag_vertex_ai_vector_search_spark.operators.evaluate import (
        dim_prefix_recall,
    )

    rng = np.random.RandomState(5)
    base = rng.randn(120, 16)
    # nested structure: early dims carry the signal (Matryoshka regime)
    base[:, 8:] *= 0.05
    emb = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(120)],
        "vec_id long, embedding array<float>",
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vector"),
    )
    rows = {
        r.prefix_dim: r
        for r in dim_prefix_recall(emb, q, dims=(4, 8, 16), k=5).collect()
    }
    assert rows[16].micro_recall == 1.0 and rows[16].frac_perfect == 1.0
    assert rows[4].micro_recall <= rows[8].micro_recall <= 1.0
    # early dims carry the signal -> the 8-dim prefix is already good
    assert rows[8].micro_recall >= 0.8
