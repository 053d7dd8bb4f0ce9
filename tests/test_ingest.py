"""Ingestion pipeline invariants (reference runtime checks, SURVEY §2.4):
row-count preservation, token gate, embedding alignment."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.sources import load_table
from rag_vertex_ai_vector_search_spark.functions import hash_embedding_numpy
from rag_vertex_ai_vector_search_spark.operators import (
    TokenLimitExceeded,
    ingest_documents,
)


def test_rowcount_preserved(spark, sf_smoke):
    """accepted + rejected == input (embeddings.py:194-199 invariant)."""
    docs = load_table(spark, sf_smoke, "documents")
    result = ingest_documents(docs, max_tokens=420)
    total = docs.count()
    assert result.datapoints.count() + result.rejected.count() == total
    assert result.metadata.count() == result.datapoints.count()


def test_fail_fast_gate(spark):
    docs = spark.createDataFrame(
        [(0, "short text"), (1, "word " * 5000)], "doc_id long, text string"
    )
    with pytest.raises(TokenLimitExceeded):
        ingest_documents(docs, max_tokens=100, fail_fast=True)
    # non-fail-fast routes to the side output instead
    result = ingest_documents(docs, max_tokens=100, fail_fast=False)
    assert result.rejected.count() == 1
    assert result.datapoints.count() == 1


def test_embedding_matches_numpy_reference(spark):
    """The distributed embedding equals the local numpy implementation
    row-by-row -- no completion-order misalignment possible (the
    reference bug at embeddings.py:180-188)."""
    texts = [f"document number {i}" for i in range(20)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    result = ingest_documents(docs, dim=16)
    got = {
        r.data_point_id: np.asarray(r.feature_vector, dtype=np.float32)
        for r in result.datapoints.collect()
    }
    meta = {r.data_point_id: r.content for r in result.metadata.collect()}
    assert len(got) == 20
    for dp_id, vec in got.items():
        expected = hash_embedding_numpy(meta[dp_id], 16)
        assert np.array_equal(vec, expected), dp_id


def test_deterministic_keys_and_restricts(spark):
    docs = spark.createDataFrame(
        [(7, "hello world", "en")], "doc_id long, text string, lang string"
    )
    r1 = ingest_documents(docs, extra_restrict_cols=("lang",)).datapoints.first()
    r2 = ingest_documents(docs, extra_restrict_cols=("lang",)).datapoints.first()
    assert r1.data_point_id == r2.data_point_id  # sha256, not uuid4
    assert dict(r1.restricts)["lang"] == ["en"]
    assert dict(r1.numeric_restricts)["embedding_dimension"] == 64
    assert dict(r1.numeric_restricts)["content_length"] == len("hello world")


def test_dual_sink_roundtrip(spark, tmp_path):
    from rag_vertex_ai_vector_search_spark.operators.ingest import write_ingest

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    )
    result = ingest_documents(docs, dim=8)
    out = str(tmp_path / "ingested")
    write_ingest(result, out)
    dp = spark.read.parquet(f"{out}/datapoints")
    md = spark.read.parquet(f"{out}/metadata")
    assert dp.count() == md.count() == 10
    joined = dp.join(md, "data_point_id")
    assert joined.count() == 10  # key join is total (Q7 contract)
