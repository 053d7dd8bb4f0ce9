"""Real-model embedding client recipe (functions/embed_client.py):
the reference's batching=10 / retry 3x1s / count-verification
semantics driven end-to-end through a FAKE transport -- no network.

Reference parity targets: common/utils/embeddings.py:100-118 (single
retry loop), :164-199 (batching + count verification),
common/config.py:59-61 (batch_size=10, retry_attempts=3,
retry_delay=1.0).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.functions.embed_client import (
    EMBEDDING_BATCH_SIZE,
    EmbeddingCountMismatchError,
    batch_embed_texts,
    model_embedding_udf,
    single_text_embed_fn,
)
from rag_vertex_ai_vector_search_spark.functions.hashing import (
    make_embed_batch,
)


class FakeTransport:
    """Deterministic fake model: vec(text) = [len(text), calls_so_far
    is NOT used -- vectors depend only on the text]. Failure injection:
    ``fail_first_n_calls`` raises a transient error on the first N
    get_embeddings invocations; ``short_response`` drops the last
    vector of every response."""

    def __init__(self, dim=4, fail_first_n_calls=0, short_response=False):
        self.dim = dim
        self.calls = 0
        self.batch_sizes = []
        self.fail_first_n_calls = fail_first_n_calls
        self.short_response = short_response

    def get_embeddings(self, texts):
        self.calls += 1
        self.batch_sizes.append(len(texts))
        if self.calls <= self.fail_first_n_calls:
            raise ConnectionError("transient: service unavailable")
        out = [
            [float(len(t))] * self.dim for t in texts
        ]
        if self.short_response:
            out = out[:-1]
        return out


def test_batching_is_reference_batch_size():
    client = FakeTransport()
    texts = [f"t{'x' * i}" for i in range(25)]
    vecs = batch_embed_texts(client, texts)
    # ceil(25 / 10) RPCs of sizes 10, 10, 5
    assert client.batch_sizes == [10, 10, 5]
    assert EMBEDDING_BATCH_SIZE == 10
    # alignment: vector i belongs to text i
    assert [v[0] for v in vecs] == [float(len(t)) for t in texts]


def test_transient_failures_retry_with_fixed_delay():
    client = FakeTransport(fail_first_n_calls=2)
    sleeps = []
    vecs = batch_embed_texts(
        client, ["a", "bb"], sleep=sleeps.append,
    )
    # attempts: fail, sleep(1), fail, sleep(1), success
    assert client.calls == 3
    assert sleeps == [1.0, 1.0]
    assert [v[0] for v in vecs] == [1.0, 2.0]


def test_retries_exhaust_and_fail_fast():
    client = FakeTransport(fail_first_n_calls=99)
    sleeps = []
    with pytest.raises(RuntimeError, match="after 3 attempts"):
        batch_embed_texts(client, ["a"], sleep=sleeps.append)
    # 3 attempts, but NO sleep after the final failure
    assert client.calls == 3
    assert sleeps == [1.0, 1.0]


def test_count_mismatch_is_an_error_not_misalignment():
    client = FakeTransport(short_response=True)
    with pytest.raises(EmbeddingCountMismatchError, match="sent 3"):
        batch_embed_texts(client, ["a", "bb", "ccc"])


def test_none_texts_embed_as_empty_string():
    client = FakeTransport()
    vecs = batch_embed_texts(client, ["abc", None])
    assert [v[0] for v in vecs] == [3.0, 0.0]


def test_single_text_path_composes_with_make_embed_batch():
    """The per-text adapter rides hashing.make_embed_batch -- the
    exact single-RPC retry loop of embeddings.py:100-118."""
    client = FakeTransport(fail_first_n_calls=1)
    sleeps = []
    fn = make_embed_batch(
        single_text_embed_fn(client), sleep=sleeps.append
    )
    vecs = fn(["a", "bb"])
    # first text: 1 failed + 1 ok; second text: 1 ok => 3 RPCs of size 1
    assert client.calls == 3
    assert client.batch_sizes == [1, 1, 1]
    assert sleeps == [1.0]
    assert [v[0] for v in vecs] == [1.0, 2.0]


def _executor_safe_factory(dim):
    """Zero-arg client factory whose class is defined INSIDE the
    closure: cloudpickle serializes it by value, so executors don't
    need this test module on their import path -- the same shape a
    real adopter's factory has (close over config strings, construct
    the client lazily on the worker)."""

    def make():
        class _WorkerFake:
            def get_embeddings(self, texts):
                return [[float(len(t))] * dim for t in texts]

        return _WorkerFake()

    return make


def test_model_embedding_udf_on_spark(spark):
    """The pandas-UDF integration: lazy per-worker client construction,
    row<->vector alignment at Spark scale."""
    df = spark.range(0, 57).select(
        F.col("id"),
        F.concat(F.lit("doc"), F.repeat(F.lit("y"), F.col("id").cast("int")))
        .alias("text"),
    ).repartition(4)
    udf = model_embedding_udf(_executor_safe_factory(3))
    out = df.withColumn("embedding", udf(F.col("text"))).collect()
    for r in out:
        assert len(r.embedding) == 3
        # len("doc") + id 'y's
        assert r.embedding[0] == pytest.approx(3.0 + r.id)


def test_model_embedding_udf_single_endpoint_mode(spark):
    df = spark.createDataFrame(
        [("a",), ("bb",), ("ccc",)], "text string"
    )
    udf = model_embedding_udf(
        _executor_safe_factory(2), use_batch_endpoint=False
    )
    got = {
        r.text: list(r.embedding)
        for r in df.withColumn("e", udf(F.col("text")))
        .select("text", F.col("e").alias("embedding")).collect()
    }
    assert got == {
        "a": [1.0, 1.0], "bb": [2.0, 2.0], "ccc": [3.0, 3.0]
    }


def test_alignment_under_many_batches():
    """100 texts / batch_size 7: every offset lands its own vector
    (the reference's as_completed interleave cannot happen here)."""
    client = FakeTransport(dim=1)
    texts = ["z" * (i % 13) for i in range(100)]
    vecs = batch_embed_texts(client, texts, batch_size=7)
    assert np.array_equal(
        np.array([v[0] for v in vecs]),
        np.array([float(len(t)) for t in texts]),
    )
    assert client.batch_sizes == [7] * 14 + [2]
