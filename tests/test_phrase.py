"""Exact phrase matching (operators/ranking.py::phrase_occurrences):
anchor-trick correctness against a hand-checked corpus, including
overlapping instances and repeated terms inside a phrase."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from rag_vertex_ai_vector_search_spark.operators.ranking import (
    phrase_occurrences,
)


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the quick brown dog"),
        (1, "quick brown quick brown quick"),      # overlapping bigrams
        (2, "a a a b"),                            # repeated-term phrase
        (3, "Quick  BROWN fox"),                   # normalization
        (4, "nothing relevant here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_counts_hand_checked(spark):
    got = {
        (r.phrase, r.doc_id): r.n_occurrences
        for r in phrase_occurrences(
            _docs(spark),
            ["quick brown", "quick brown fox", "a a", "the quick brown"],
        ).collect()
    }
    assert got[("quick brown", 0)] == 2
    assert got[("quick brown", 1)] == 2
    assert got[("quick brown", 3)] == 1          # case/space normalized
    assert got[("quick brown fox", 0)] == 1
    assert got[("quick brown fox", 3)] == 1
    assert got[("the quick brown", 0)] == 2
    # "a a" in "a a a b": anchors 0 and 1 -> 2 overlapping occurrences
    assert got[("a a", 2)] == 2
    # docs with no occurrence produce NO row (doc 4 absent entirely)
    assert not any(d == 4 for (_, d) in got)
    assert ("quick brown fox", 1) not in got


def test_phrase_empty_input_validation(spark):
    with pytest.raises(ValueError, match="at least one phrase"):
        phrase_occurrences(_docs(spark), [])
    with pytest.raises(ValueError, match="empty phrase"):
        phrase_occurrences(_docs(spark), ["ok phrase", "   "])
