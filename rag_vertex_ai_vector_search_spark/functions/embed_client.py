"""Real-model embedding-client recipe: the documented integration an
adopter wires a production embedding service into.

The engine's embedding surface is ``functions/hashing.py``: a
pandas-UDF seam whose ``embed_fn`` defaults to the deterministic hash
pseudo-embedder. This module is the OTHER side of that seam -- the
client wrapper that reproduces the reference's serving semantics
(``common/utils/embeddings.py``):

- micro-batching at ``EMBEDDING_BATCH_SIZE`` texts per RPC
  (embeddings.py:166-169, config batch_size=10);
- retry: ``retry_attempts=3`` with a fixed ``retry_delay=1 s`` between
  attempts, fail-fast after the last (embeddings.py:100-118,
  config.py:60-61). The reference only retries its single-text path;
  here the BATCH RPC retries under the same policy (SURVEY.md §2.4);
- count verification: a response whose vector count differs from the
  request's text count raises instead of silently misaligning
  (embeddings.py:194-199);
- alignment: results are placed by REQUEST ORDER. The reference
  extends a shared list from ``as_completed`` futures, which can
  interleave batches out of order (embeddings.py:180-188, the O6
  misalignment bug SURVEY.md documents); batches here land at their
  own offsets so row<->vector pairing is positional by construction.

No network code lives here: ``ModelClient`` is a one-method protocol
(``get_embeddings(texts) -> vectors``) any SDK adapts in ~3 lines, and
the tests drive the full policy through a fake transport with injected
transient failures (tests/test_embed_client.py).

Spark shape: one client per EXECUTOR TASK (built lazily inside the
UDF via the zero-arg ``client_factory``, since RPC clients rarely
pickle), Arrow-batched pandas UDFs, parallelism = task parallelism --
the ThreadPoolExecutor fan-out of the reference maps onto Spark's own
scheduling instead of a per-driver thread pool.
"""

from __future__ import annotations

from typing import Callable, Protocol, Sequence

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .hashing import RETRY_ATTEMPTS, RETRY_DELAY_S, make_embed_batch

# The reference's EMBEDDING_BATCH_SIZE (common/config.py:59).
EMBEDDING_BATCH_SIZE = 10


class ModelClient(Protocol):
    """The transport seam: one RPC, texts in, vectors out, same order.

    Adapting a real SDK is a closure over its client object, e.g.::

        class MyModelClient:
            def __init__(self, model):
                self._model = model
            def get_embeddings(self, texts):
                return [e.values for e in self._model.get_embeddings(texts)]
    """

    def get_embeddings(
        self, texts: Sequence[str]
    ) -> Sequence[Sequence[float]]: ...


class EmbeddingCountMismatchError(RuntimeError):
    """The model returned a different number of vectors than texts
    sent -- misalignment would silently pair rows with wrong vectors,
    so it is an error (embeddings.py:194-199)."""


def single_text_embed_fn(client: ModelClient) -> Callable[[str], list]:
    """str -> vector adapter for ``make_embed_batch`` -- the
    reference's single-text path (embeddings.py:100-118): one text per
    RPC, the caller's retry loop around it. Use when the model API has
    no batch endpoint; otherwise prefer ``batch_embed_texts``."""

    def _one(text: str) -> list:
        out = client.get_embeddings([text])
        if len(out) != 1:
            raise EmbeddingCountMismatchError(
                f"expected 1 embedding, got {len(out)}"
            )
        return list(out[0])

    return _one


def batch_embed_texts(
    client: ModelClient,
    texts: Sequence[str],
    *,
    batch_size: int = EMBEDDING_BATCH_SIZE,
    max_retries: int = RETRY_ATTEMPTS,
    retry_delay_s: float = RETRY_DELAY_S,
    sleep=None,
) -> list[list[float]]:
    """Embed ``texts`` through batched RPCs with the reference's
    retry/verify policy; returns vectors aligned to ``texts`` order.

    Per-batch: up to ``max_retries`` attempts with ``retry_delay_s``
    between them (no delay after the final failure -- fail fast like
    embeddings.py:115-118), then a count check. None texts embed as ''
    (the same contract make_embed_batch applies).
    """
    import time as _time

    do_sleep = _time.sleep if sleep is None else sleep
    prepared = ["" if t is None else t for t in texts]
    out: list[list[float]] = [None] * len(prepared)  # type: ignore[list-item]
    for start in range(0, len(prepared), batch_size):
        batch = prepared[start:start + batch_size]
        last_err: Exception | None = None
        for attempt in range(max_retries):
            try:
                vecs = client.get_embeddings(batch)
                break
            except Exception as e:  # noqa: BLE001 -- transport errors retry
                last_err = e
                if attempt + 1 < max_retries:
                    do_sleep(retry_delay_s)
        else:
            raise RuntimeError(
                f"embedding batch at offset {start} failed after "
                f"{max_retries} attempts"
            ) from last_err
        if len(vecs) != len(batch):
            raise EmbeddingCountMismatchError(
                f"batch at offset {start}: sent {len(batch)} texts, "
                f"got {len(vecs)} embeddings"
            )
        out[start:start + len(batch)] = [list(v) for v in vecs]
    return out


def model_embedding_udf(
    client_factory: Callable[[], ModelClient],
    *,
    batch_size: int = EMBEDDING_BATCH_SIZE,
    max_retries: int = RETRY_ATTEMPTS,
    retry_delay_s: float = RETRY_DELAY_S,
    use_batch_endpoint: bool = True,
):
    """pandas_udf: text column -> array<float> via a real model client.

    Drop-in replacement for ``hashing.hash_embedding_udf()``:

        df.withColumn("embedding", model_embedding_udf(make_client)(
            F.col("text")))

    ``client_factory`` is a zero-arg constructor evaluated lazily on
    the EXECUTOR (first Arrow batch of each Python worker) because RPC
    clients rarely survive pickling; anything it needs (endpoint,
    credentials path) should be closed over as plain strings.

    ``use_batch_endpoint=False`` routes through make_embed_batch's
    per-text loop (single-RPC APIs) -- same retry policy either way.
    """
    state: dict = {}

    def _client() -> ModelClient:
        if "c" not in state:
            state["c"] = client_factory()
        return state["c"]

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _udf(texts: pd.Series) -> pd.Series:
        if use_batch_endpoint:
            vecs = batch_embed_texts(
                _client(), list(texts),
                batch_size=batch_size, max_retries=max_retries,
                retry_delay_s=retry_delay_s,
            )
        else:
            fn = make_embed_batch(
                single_text_embed_fn(_client()), max_retries, retry_delay_s
            )
            vecs = fn(list(texts))
        return pd.Series(vecs)

    return _udf
