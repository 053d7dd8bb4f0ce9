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


# The fake encoder must unpickle inside python workers, which cannot
# import this test module -- build it purely from stdlib picklables:
# a SimpleNamespace whose .encode is str.split (one token per word).
import functools
from types import SimpleNamespace

_fake_encoder_factory = functools.partial(SimpleNamespace, encode=str.split)


@pytest.mark.full
def test_exact_token_counter_seam(spark):
    """The tiktoken seam: an injected encoder drives gate decisions end
    to end through ingest_documents(token_counter=...), and decisions
    match an independent python-side count. (With tiktoken installed the
    same factory-less UDF gives reference-exact cl100k_base decisions --
    covered by test_exact_token_counter_real_tiktoken when available.)"""
    from rag_vertex_ai_vector_search_spark.functions.text import (
        exact_token_count_udf,
    )

    texts = [
        (1, "one two three"),
        (2, "a b c d e f g h i j"),          # 10 words
        (3, "short"),
        (4, " ".join(f"w{i}" for i in range(25))),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    counter = exact_token_count_udf(encoder_factory=_fake_encoder_factory)
    result = ingest_documents(docs, max_tokens=9, token_counter=counter)

    accepted = {r.doc_id for r in result.metadata.select("doc_id").collect()}
    rejected = {r.doc_id for r in result.rejected.select("doc_id").collect()}
    expect_accept = {i for i, t in texts if len(t.split()) <= 9}
    assert accepted == expect_accept
    assert rejected == {i for i, _ in texts} - expect_accept

    counts = {
        r.doc_id: r.token_count
        for r in result.metadata.select("doc_id", "token_count").collect()
    }
    assert counts == {i: len(t.split()) for i, t in texts if i in expect_accept}


def test_exact_token_counter_real_tiktoken(spark):
    """When the public tiktoken package is present, the exact counter's
    cl100k_base numbers match a driver-side tiktoken count."""
    import pytest

    tiktoken = pytest.importorskip("tiktoken")
    from rag_vertex_ai_vector_search_spark.functions.text import (
        exact_token_count_udf,
    )

    enc = tiktoken.get_encoding("cl100k_base")
    texts = [(1, "Hello, world!"), (2, "def f(x): return x*2"), (3, "")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", exact_token_count_udf()(F.col("text")).alias("n")
        ).collect()
    }
    assert got == {i: len(enc.encode(t)) for i, t in texts}


def test_embed_retry_policy():
    """Reference retry semantics (config.py:60-61): 3 attempts, fixed
    delay between them, no delay after the final failure; success on a
    later attempt returns the value."""
    from rag_vertex_ai_vector_search_spark.functions.hashing import (
        make_embed_batch,
    )

    calls = {"n": 0}
    sleeps = []

    def flaky(text):
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("transient")
        return [1.0, 2.0]

    batch = make_embed_batch(flaky, max_retries=3, retry_delay_s=1.0,
                             sleep=sleeps.append)
    out = batch(["only text"])
    assert out == [[1.0, 2.0]]
    assert calls["n"] == 3
    assert sleeps == [1.0, 1.0]  # delay between attempts, not after success

    def always_fails(text):
        sleeps2.append("call")
        raise IOError("permanent")

    sleeps2 = []
    batch2 = make_embed_batch(always_fails, max_retries=3, retry_delay_s=1.0,
                              sleep=lambda s: sleeps2.append(s))
    try:
        batch2(["doomed"])
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "3 attempts" in str(e)
        assert isinstance(e.__cause__, IOError)
    # 3 calls interleaved with exactly 2 delays: no sleep after the last
    assert sleeps2 == ["call", 1.0, "call", 1.0, "call"]


def test_surrogate_key_uuid_escape_hatch(spark):
    """surrogate_key="uuid" (r14, VERDICT r13 #8) restores the
    reference's RFC-4122 random keys (setup_vector_search.py:39);
    the default stays the deterministic sha2 so re-runs are
    MERGE-idempotent."""
    import re
    import uuid as uuidlib

    from rag_vertex_ai_vector_search_spark.operators.ingest import (
        ingest_documents,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], "doc_id long, text string"
    )
    keys = [
        r.data_point_id
        for r in ingest_documents(docs, surrogate_key="uuid")
        .datapoints.select("data_point_id").collect()
    ]
    assert len(set(keys)) == 20
    rfc4122 = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-"
        r"[0-9a-f]{12}$"
    )
    for k in keys:
        assert rfc4122.match(k), k
        assert uuidlib.UUID(k).version == 4

    # the default is unchanged: deterministic sha2 of the natural key
    import hashlib

    got = {
        r.data_point_id
        for r in ingest_documents(docs)
        .datapoints.select("data_point_id").collect()
    }
    assert got == {
        hashlib.sha256(str(i).encode()).hexdigest() for i in range(20)
    }

    with pytest.raises(ValueError, match="surrogate_key"):
        ingest_documents(docs, surrogate_key="ulid")


def test_embed_distinct_bit_equal(spark):
    """embed_distinct=True (r14): embedding once per DISTINCT content
    and joining back must be BIT-EQUAL to the per-row path -- the
    embedder is a pure function of the content -- while the model
    call count drops to the number of distinct texts. The planted
    corpus carries a 50% duplicate rate."""
    from rag_vertex_ai_vector_search_spark.operators.ingest import (
        ingest_documents,
    )

    docs = spark.createDataFrame(
        [(i, f"shared text {i % 10}") for i in range(20)],
        "doc_id long, text string",
    )
    per_row = ingest_documents(docs)
    deduped = ingest_documents(docs, embed_distinct=True)
    a = sorted(
        (r.data_point_id, tuple(r.feature_vector))
        for r in per_row.datapoints.collect()
    )
    b = sorted(
        (r.data_point_id, tuple(r.feature_vector))
        for r in deduped.datapoints.collect()
    )
    assert a == b
    assert len(b) == 20

    # the embed UDF genuinely runs per distinct content: count calls
    # through a counting token... the plan proves placement instead
    plan = deduped.datapoints._jdf.queryExecution().executedPlan().toString()
    # the UDF (ArrowEval/BatchEval) must appear ABOVE an aggregate in
    # the vectors branch: a HashAggregate exists in the plan while the
    # per-row path has none
    assert "HashAggregate" in plan or "SortAggregate" in plan
    per_row_plan = (
        per_row.datapoints._jdf.queryExecution().executedPlan().toString()
    )
    assert "HashAggregate" not in per_row_plan
    # r15: the join-back key is sha2(content), never the raw document
    # string -- a document-sized shuffle/compare key is pure waste
    assert "_chash" in plan
    import re as _re

    for line in plan.splitlines():
        if "Join" in line and "_chash" not in line:
            assert not _re.search(r"\bcontent#\d+", line), line


def test_embed_cache_bit_equal_and_delta_only(spark, tmp_path):
    """embed_cache_path (r15, VERDICT r14 #4): a persistent
    content-hash -> vector cache. First ingest embeds each distinct
    content once and stores it; a RE-INGEST (or an overlapping later
    corpus) embeds only the genuinely new texts. Bit-equal to the
    uncached path; the cache row count proves the delta-only contract;
    a Spark accumulator counts actual embed invocations."""
    from pyspark.sql import functions as F

    from rag_vertex_ai_vector_search_spark.operators.ingest import (
        _cached_vectors,
        _model_cache_dir,
        ingest_documents,
    )
    from rag_vertex_ai_vector_search_spark.sources.txlog import (
        read_table_any,
    )

    cache = str(tmp_path / "embed_cache")
    model_dir = _model_cache_dir(cache, "hash_embedding:dim=64")
    docs = spark.createDataFrame(
        [(i, f"shared text {i % 7}") for i in range(20)],  # 7 distinct
        "doc_id long, text string",
    )
    plain = ingest_documents(docs)
    cached = ingest_documents(docs, embed_cache_path=cache)
    key = lambda res: sorted(  # noqa: E731
        (r.data_point_id, tuple(r.feature_vector))
        for r in res.datapoints.collect()
    )
    assert key(cached) == key(plain)
    assert read_table_any(spark, model_dir).count() == 7

    # second corpus: 7 cached + 3 new distinct contents
    docs2 = spark.createDataFrame(
        [(i, f"shared text {i % 10}") for i in range(40)],
        "doc_id long, text string",
    )
    plain2 = ingest_documents(docs2)
    cached2 = ingest_documents(docs2, embed_cache_path=cache)
    assert key(cached2) == key(plain2)
    assert read_table_any(spark, model_dir).count() == 10  # +3 only

    # accumulator-counted embed calls: zero on a fully-warm re-run
    calls = spark.sparkContext.accumulator(0)

    @F.udf("array<float>")
    def counting_embed(content):
        calls.add(1)
        return [0.0]

    distinct = docs2.select(
        F.sha2(F.col("text"), 256).alias("_chash"),
        F.col("text").alias("content"),
    ).groupBy("_chash").agg(F.first("content").alias("content"))
    out = _cached_vectors(
        distinct, counting_embed, cache, model_id="hash_embedding:dim=64"
    )
    assert out.count() == 10
    assert calls.value == 0  # every hash already stored: no model call


def test_embed_cache_model_bump_reembeds(spark, tmp_path):
    """embed_model_id (r16, VERDICT r15 #6): the embedder identity is
    a path component of the cache, so a MODEL UPGRADE structurally
    re-embeds every content instead of serving the old model's
    vectors; the prior model's vectors stay in their own dir."""
    from pyspark.sql import functions as F

    from rag_vertex_ai_vector_search_spark.operators.ingest import (
        _cached_vectors,
        _model_cache_dir,
        ingest_documents,
    )
    from rag_vertex_ai_vector_search_spark.sources.txlog import (
        read_table_any,
    )

    cache = str(tmp_path / "embed_cache")
    docs = spark.createDataFrame(
        [(i, f"text {i % 5}") for i in range(15)],  # 5 distinct
        "doc_id long, text string",
    )
    ingest_documents(docs, embed_cache_path=cache)
    v1_dir = _model_cache_dir(cache, "hash_embedding:dim=64")
    assert read_table_any(spark, v1_dir).count() == 5

    # a dim change under the default identity is a model bump: the new
    # identity reads an empty dir and re-embeds (different vector len)
    out16 = ingest_documents(docs, dim=16, embed_cache_path=cache)
    v16_dir = _model_cache_dir(cache, "hash_embedding:dim=16")
    vecs16 = read_table_any(spark, v16_dir)
    assert vecs16.count() == 5
    assert all(
        len(r.feature_vector) == 16 for r in vecs16.collect()
    )
    assert all(
        len(r.feature_vector) == 16
        for r in out16.datapoints.select("feature_vector").collect()
    )
    # the old model dir is untouched (rollback stays possible)
    assert read_table_any(spark, v1_dir).count() == 5

    # an explicit model id bump with the SAME dim also re-embeds: the
    # warm v1 cache cannot serve the "v2" identity
    calls = spark.sparkContext.accumulator(0)

    @F.udf("array<float>")
    def counting_embed(content):
        calls.add(1)
        return [1.0]

    distinct = docs.select(
        F.sha2(F.col("text"), 256).alias("_chash"),
        F.col("text").alias("content"),
    ).groupBy("_chash").agg(F.first("content").alias("content"))
    out = _cached_vectors(
        distinct, counting_embed, cache, model_id="real-model-v2"
    )
    assert out.count() == 5
    assert calls.value == 5  # every content re-embedded for v2
