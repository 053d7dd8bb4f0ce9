"""chunk_documents: coverage / overlap / determinism invariants."""

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators import chunk_documents


def _chunks(spark, text, chunk_tokens=8, overlap=2):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return (
        chunk_documents(df, chunk_tokens=chunk_tokens, overlap=overlap)
        .orderBy("chunk_index")
        .collect()
    )


def test_short_doc_single_chunk(spark):
    rows = _chunks(spark, "a b c")
    assert len(rows) == 1
    assert rows[0].chunk_text == "a b c" and rows[0].n_tokens == 3
    assert rows[0].chunk_index == 0


def test_every_word_covered_and_overlap_exact(spark):
    words = [f"w{i}" for i in range(25)]
    rows = _chunks(spark, " ".join(words), chunk_tokens=8, overlap=2)
    seen = set()
    for i, r in enumerate(rows):
        toks = r.chunk_text.split(" ")
        assert len(toks) == r.n_tokens
        if i + 1 < len(rows):
            nxt = rows[i + 1].chunk_text.split(" ")
            assert toks[-2:] == nxt[:2]  # consecutive chunks share overlap
        seen.update(toks)
    assert seen == set(words)
    # starts advance by step = chunk - overlap
    assert [r.chunk_index for r in rows] == list(range(len(rows)))


def test_exact_window_boundary(spark):
    # n_words == chunk_tokens: exactly one chunk, not one + a tail
    words = [f"w{i}" for i in range(8)]
    rows = _chunks(spark, " ".join(words), chunk_tokens=8, overlap=2)
    assert len(rows) == 1 and rows[0].n_tokens == 8


def test_bad_overlap_raises(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_empty_text_one_empty_chunk(spark):
    rows = _chunks(spark, "")
    assert len(rows) == 1 and rows[0].chunk_text == ""


def test_no_shuffle_in_plan(spark):
    """Chunking must stay a narrow transformation (scan + generate)."""
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
