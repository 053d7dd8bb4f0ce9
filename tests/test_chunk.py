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


def test_split_sentences_semantics(spark):
    from pyspark.sql import functions as F

    from rag_vertex_ai_vector_search_spark.functions.text import (
        split_sentences,
    )

    rows = [
        (1, "First one. Second here! Third? trailing bit"),
        (2, "no terminators at all"),
        (3, "Ellipsis wait... then more."),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.s
        for r in df.select("doc_id", split_sentences("text").alias("s"))
        .collect()
    }
    assert out[1] == ["First one.", "Second here!", "Third?", "trailing bit"]
    assert out[2] == ["no terminators at all"]
    # the '...' run stays attached to its sentence
    assert out[3] == ["Ellipsis wait...", "then more."]
    assert out[4] == []


def test_chunk_by_sentences_packing(spark):
    from rag_vertex_ai_vector_search_spark.operators.chunk import (
        chunk_by_sentences,
    )

    # sentences of 4 / 4 / 4 / 2 tokens, budget 8:
    # offsets 0,4,8,12 -> chunks 0,0,1,1
    text = "a b c one. d e f two. g h i three! j four."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = {
        r.chunk_index: r
        for r in chunk_by_sentences(df, budget_tokens=8).collect()
    }
    assert set(out) == {0, 1}
    assert out[0].chunk_text == "a b c one. d e f two."
    assert (out[0].n_sentences, out[0].n_tokens) == (2, 8)
    assert out[1].chunk_text == "g h i three! j four."
    assert (out[1].n_sentences, out[1].n_tokens) == (2, 6)

    # a sentence is never split: one giant sentence = one chunk
    big = " ".join(f"w{i}" for i in range(50)) + "."
    df2 = spark.createDataFrame([(2, big)], "doc_id long, text string")
    rows = chunk_by_sentences(df2, budget_tokens=8).collect()
    assert len(rows) == 1 and rows[0].n_tokens == 50
