"""bm25_topk vs a pure-Python BM25 reference on a toy corpus."""

import math

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators import bm25_topk

CORPUS = [
    (0, "spark joins are fast and spark scans are wide"),
    (1, "vector search with spark"),
    (2, "slow full table scan"),
    (3, "join join join"),
    (4, "unrelated words entirely"),
]


def _ref_bm25(terms, k1=1.2, b=0.75):
    docs = {i: t.lower().split() for i, t in CORPUS}
    n = float(len(docs))
    avgdl = sum(len(w) for w in docs.values()) / n
    dfreq = {
        t: float(sum(1 for w in docs.values() if t in w)) for t in terms
    }
    out = {}
    for i, w in docs.items():
        s = 0.0
        for t in terms:
            tf = float(w.count(t))
            idf = math.log(((n - dfreq[t]) + 0.5) / (dfreq[t] + 0.5) + 1.0)
            s += idf * ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (len(w) / avgdl))))
        out[i] = s
    return out


def test_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {
        r.doc_id: r.score
        for r in bm25_topk(df, ("spark", "join"), top_n=5).collect()
    }
    ref = _ref_bm25(("spark", "join"))
    assert set(got) == set(ref)
    for d in got:
        assert got[d] == pytest.approx(ref[d], abs=1e-12)
    # doc 0 (two 'spark') must outrank doc 1 (one 'spark', shorter)
    # ordering sanity: the no-match doc scores exactly 0
    assert got[4] == 0.0


def test_rank_deterministic_and_bounded(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    out = bm25_topk(df, ("join",), top_n=3).collect()
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3]
    top = min(out, key=lambda r: r.rank)
    assert top.doc_id == 3  # the all-'join' doc wins


def test_empty_terms_raises(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        bm25_topk(df, ())
