"""Unigram surprisal: rare text scores higher, external-model scoring,
quantization bound."""

import math

from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.lm_quality import (
    SURPRISAL_SCALE,
    unigram_counts,
    unigram_surprisal,
)


def test_rare_words_score_higher(spark):
    common = "the cat sat on the mat " * 10
    docs = spark.createDataFrame(
        [(1, common), (2, common), (3, common),
         (4, "zyx wvu tsr qpo nml kji")],  # singleton words
        "doc_id long, text string",
    )
    out = {r.doc_id: r.avg_surprisal_nats
           for r in unigram_surprisal(docs).collect()}
    assert out[4] > out[1] * 1.5
    assert out[1] == out[2] == out[3]  # identical docs, identical score


def test_matches_python_reference(spark):
    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "b b c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in unigram_surprisal(docs, alpha=0.5).collect()}
    counts = {"a": 2, "b": 3, "c": 2}
    N, V, alpha = 7, 3, 0.5
    denom = N + alpha * V

    def surp(w):
        return math.floor(
            -math.log((counts[w] + alpha) / denom) * SURPRISAL_SCALE
        )

    for doc_id, words in ((1, "a b a c".split()), (2, "b b c".split())):
        expected = sum(surp(w) for w in words) / (
            SURPRISAL_SCALE * len(words)
        )
        assert out[doc_id].avg_surprisal_nats == expected
        assert out[doc_id].n_words == len(words)


def test_external_model_unseen_words(spark):
    """Scoring under a reference-corpus model: unseen words take the
    alpha-smoothed zero-count probability (max surprisal)."""
    ref = spark.createDataFrame(
        [(0, "common words common words")], "doc_id long, text string"
    )
    model = unigram_counts(ref)
    docs = spark.createDataFrame(
        [(1, "common words"), (2, "unseen tokens")], "doc_id long, text string"
    )
    out = {r.doc_id: r.avg_surprisal_nats
           for r in unigram_surprisal(docs, counts=model).collect()}
    assert out[2] > out[1]
