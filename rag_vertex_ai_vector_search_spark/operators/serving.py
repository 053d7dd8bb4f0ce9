"""Warm-replica interactive serving (reference common/config.py:44-50:
a deployed endpoint keeps min_replica_count=1 warm 2-vCPU replicas and
answers single queries from resident index state).

``ServingReplica`` holds every request-INDEPENDENT piece resident --
the cached tree-AH layout (assigned vectors + PQ codes), centroid
matrix, codebooks, hydration table -- and makes the per-request work
minimal:

- **Query embedding runs driver-side** through the SAME
  ``hash_embedding_numpy`` the ingest pandas UDF wraps
  (functions/hashing.py:44), so the vector is bit-identical to the
  batch path while a one-row request pays zero Spark jobs for it (the
  UDF route costs a fan-out + Arrow + Python-worker round trip --
  ~0.65 s of pure overhead per request at sf0.1). This mirrors the
  reference's serving split: queries embed through the same direct
  model seam the ingest path uses (common/utils/embeddings.py::
  embed_texts), in-process on the caller, never through a batch job
  -- its rag/search.py query layer is a stub, so the deployed
  endpoint's warm-replica semantics (config.py:44-50) are the
  binding contract.
- **Token gate + surrogate key driver-side**, same formulas as
  ``ingest_documents`` (regex token count with ASCII classes matching
  Java's ``\\s``; sha256 of the id string == ``F.sha2`` output).
- **Probe assignment driver-side** (inside ``ivf_pq_search``'s
  broadcast path -- the replica passes a local one-row query relation,
  so the collect that feeds it never launches a job).

The timed request is then just the cascade itself: ADC scan of the
probed leaf partitions + shortlist rerank + broadcast hydration.
Request-scale only by design -- batch/data-scale query sets should go
through ``ivf_pq_search(method="cogroup")`` directly.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import DEFAULT_DIM, hash_embedding_numpy
from ..functions.text import TOKEN_PATTERN
from .ingest import MAX_TOKENS_PER_TEXT, TokenLimitExceeded

# Python-side twin of functions/text.py::token_count. re.ASCII pins
# \s to [ \t\n\v\f\r] -- the same set Java's \s matches -- so the gate
# decision is identical to the SQL regexp_count path.
_TOKEN_RE = re.compile(TOKEN_PATTERN, re.ASCII)


def surrogate_key(doc_id) -> str:
    """Driver-side twin of the ingest surrogate key
    (operators/ingest.py: sha2(concat_ws("||", id.cast("string")),
    256) -- concat_ws over ONE column is just the string)."""
    return hashlib.sha256(str(doc_id).encode("utf-8")).hexdigest()


def embed_query_text(
    text: str, *, dim: int = DEFAULT_DIM, max_tokens: int = MAX_TOKENS_PER_TEXT
) -> np.ndarray:
    """Embed one query text driver-side: the ingest token gate
    (config.py:57) then the exact UDF embed function. float32, unit
    norm -- bit-identical to what the batch path stores."""
    n_tokens = len(_TOKEN_RE.findall(text or ""))
    if n_tokens > max_tokens:
        raise TokenLimitExceeded(
            f"query has {n_tokens} tokens > {max_tokens}"
        )
    return hash_embedding_numpy("" if text is None else text, dim)


class ServingReplica:
    """Request-independent serving state, built once per process.

    ``ivf_index`` / ``pq_index`` should wrap the CACHED read-back of a
    saved ``partitionBy("cluster_id")`` layout (the warm-replica
    startup cost, paid outside any request); ``docs`` is the cached
    hydration table keyed by ``doc_id_col``.
    """

    def __init__(
        self,
        spark: SparkSession,
        ivf_index,
        pq_index,
        docs: DataFrame | None = None,
        *,
        dim: int = DEFAULT_DIM,
        max_tokens: int = MAX_TOKENS_PER_TEXT,
        doc_id_col: str = "doc_id",
        hydrate_cols: tuple[str, ...] = ("lang", "source"),
    ) -> None:
        self.spark = spark
        self.ivf = ivf_index
        self.pq = pq_index
        self.docs = docs
        self.dim = dim
        self.max_tokens = max_tokens
        self.doc_id_col = doc_id_col
        self.hydrate_cols = hydrate_cols
        # The one-row query relation's schema, fixed per replica.
        self._q_schema = (
            "query_id string, query_vector array<float>"
        )

    def query_vector_df(self, doc_id, text: str) -> DataFrame:
        """(query_id, query_vector) as a LOCAL one-row relation --
        built through pandas so the Arrow conversion yields a true
        LocalRelation (collect() on it is driver-only, no job; a
        list-based createDataFrame builds a LogicalRDD whose every
        collect is a defaultParallelism-task job)."""
        import pandas as pd

        vec = embed_query_text(
            text, dim=self.dim, max_tokens=self.max_tokens
        )
        return self.spark.createDataFrame(
            pd.DataFrame({
                "query_id": [surrogate_key(doc_id)],
                "query_vector": [[float(x) for x in vec]],
            }),
            self._q_schema,
        )

    def query(
        self,
        text: str,
        *,
        doc_id=0,
        k: int = 10,
        probe_percent: float = 10.0,
        rerank_candidates: int | None = None,
        restrict=None,
        per_crowding_k: int | None = None,
        crowding_col: str | None = None,
    ) -> DataFrame:
        """One interactive query end-to-end: driver-side embed ->
        tree-AH cascade over the resident index -> broadcast metadata
        hydration. Returns (query_id, rank, neighbor_id, score
        [, hydrate_cols...])."""
        from .pq import ivf_pq_search

        qvec = self.query_vector_df(doc_id, text)
        hits = ivf_pq_search(
            self.ivf, self.pq, qvec, k,
            probe_percent=probe_percent,
            rerank_candidates=rerank_candidates,
            method="broadcast",
            restrict=restrict,
            per_crowding_k=per_crowding_k,
            crowding_col=crowding_col,
        )
        if self.docs is None:
            return hits
        docs = self.docs
        return hits.join(
            F.broadcast(docs),
            hits.neighbor_id == docs[self.doc_id_col],
            "left",
        ).select(
            "query_id", F.col("rank").cast("long").alias("rank"),
            "neighbor_id", "score", *self.hydrate_cols,
        )

    def query_many(
        self,
        requests,
        *,
        max_workers: int = 8,
        **query_kwargs,
    ) -> list:
        """Answer a STREAM of concurrent interactive requests sharing
        this replica's SparkSession (the reference endpoint's premise:
        one warm replica, many in-flight requests -- config.py:44-50
        min=max=1 replicas). ``requests`` is an iterable of
        (doc_id, text); each request runs on its own thread as its own
        Spark job (SparkSession job submission is thread-safe; collect
        blocks in py4j socket I/O, releasing the GIL, so requests
        genuinely overlap on the executor slots). Per-request state is
        all thread-local -- the replica itself holds only immutable
        request-INDEPENDENT state -- so concurrent answers are
        bit-equal to sequential ones (pinned in
        tests/test_serving.py::test_concurrent_queries_bit_equal).

        Returns ``[(doc_id, [Row, ...]), ...]`` in request order.
        Request-scale only, like ``query``: a data-scale query SET
        belongs in one ``ivf_pq_search(method="cogroup")`` job, not a
        thread pool.
        """
        from concurrent.futures import ThreadPoolExecutor

        reqs = list(requests)

        def _one(req):
            doc_id, text = req
            return self.query(
                text, doc_id=doc_id, **query_kwargs
            ).collect()

        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            rows = list(pool.map(_one, reqs))
        return [(doc_id, r) for (doc_id, _), r in zip(reqs, rows)]

    def query_batch(
        self,
        requests,
        *,
        k: int = 10,
        probe_percent: float = 10.0,
        rerank_candidates: int | None = None,
        restrict=None,
        per_crowding_k: int | None = None,
        crowding_col: str | None = None,
    ) -> list:
        """Request COALESCING: answer a window of in-flight requests as
        ONE Spark job. ``query_many`` isolates requests (one job each)
        but pays per-job driver overhead -- plan analysis, DAGScheduler
        round-trips, codegen -- ~0.6 s/request regardless of data size,
        so a thread pool tops out near 4 q/s. Stacking the embedded
        query vectors into one LocalRelation and running the SAME
        cascade once amortizes every fixed cost across the window (the
        classic serving-system dynamic-batching move); per-query
        results are bit-equal to ``query`` because ``ivf_pq_search``
        ranks within query_id partitions by construction.

        Returns ``[(doc_id, [Row, ...]), ...]`` in request order.
        """
        import pandas as pd

        from .pq import ivf_pq_search

        reqs = list(requests)
        keys = [surrogate_key(doc_id) for doc_id, _ in reqs]
        if len(set(keys)) != len(keys):
            # two requests sharing a doc_id would share a query_id,
            # and the cascade ranks WITHIN query_id -- their neighbor
            # lists would silently merge. Request ids must be unique
            # per window (the isolation path query_many has no such
            # constraint -- each request is its own job).
            raise ValueError(
                "duplicate doc_id in query_batch window; request ids "
                "must be unique per batch"
            )
        vecs = [
            [float(x) for x in embed_query_text(
                text, dim=self.dim, max_tokens=self.max_tokens
            )]
            for _, text in reqs
        ]
        qdf = self.spark.createDataFrame(
            pd.DataFrame({"query_id": keys, "query_vector": vecs}),
            self._q_schema,
        )
        hits = ivf_pq_search(
            self.ivf, self.pq, qdf, k,
            probe_percent=probe_percent,
            rerank_candidates=rerank_candidates,
            method="broadcast",
            restrict=restrict,
            per_crowding_k=per_crowding_k,
            crowding_col=crowding_col,
        )
        if self.docs is not None:
            docs = self.docs
            hits = hits.join(
                F.broadcast(docs),
                hits.neighbor_id == docs[self.doc_id_col],
                "left",
            ).select(
                "query_id", F.col("rank").cast("long").alias("rank"),
                "neighbor_id", "score", *self.hydrate_cols,
            )
        by_key: dict[str, list] = {key: [] for key in keys}
        for row in hits.collect():
            by_key[row.query_id].append(row)
        for rows in by_key.values():
            rows.sort(key=lambda r: r.rank)
        return [
            (doc_id, by_key[key]) for (doc_id, _), key in zip(reqs, keys)
        ]
