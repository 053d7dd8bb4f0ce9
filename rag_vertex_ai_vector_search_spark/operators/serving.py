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
from dataclasses import dataclass, field

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


@dataclass
class ReplicaSource:
    """Durable-layout descriptor a ``ServingReplica`` can (re)build its
    resident state from -- the missing half of the reference's
    STREAM_UPDATE serving contract (index_manager.py:53: the deployed
    index keeps mutating AFTER deploy via upsert_datapoints,
    setup_vector_search.py:147-153, and the endpoint's sync state is
    observable, index_manager.py:140-166). A replica built from plain
    DataFrames is a snapshot; one built from a source can detect that
    maintenance (``merge_into_table`` / ``stream_merge_into_ivf_index``
    / ``recluster_ivf_index``) moved the on-disk layout and re-warm
    itself without a process restart.

    - ``vectors_path``: the saved IVF layout (``partitionBy
      ("cluster_id")`` or the streaming ``(_bucket, cluster_id)``).
    - ``codes_path``: the PQ code layout (``encode_pq`` output written
      ``partitionBy("cluster_id")``); None = no-ADC replica.
    - ``centroids``: a (n, dim) matrix, a zero-arg callable returning
      one, or None to read the layout's ``_centroids`` sidecar
      (``operators/ivf.py::save_centroids``; ``recluster_ivf_index``
      keeps that sidecar current, so None is the right default for a
      maintained index).
    - ``books``: PQCodebooks or a zero-arg callable (callable when
      maintenance may retrain them).
    - ``docs``: hydration-table loader -- a callable(spark) returning
      a DataFrame (re-invoked and re-cached on every refresh), a
      static DataFrame (never refreshed), or None.
    - ``extra_paths``: additional table paths (e.g. the docs table)
      folded into the staleness fingerprint.
    """

    vectors_path: str
    codes_path: str | None = None
    centroids: object = None
    books: object = None
    docs: object = None
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    extra_paths: tuple[str, ...] = field(default_factory=tuple)

    def snapshot_paths(self) -> tuple[str, ...]:
        paths = [self.vectors_path]
        if self.codes_path:
            paths.append(self.codes_path)
        paths.extend(self.extra_paths)
        return tuple(paths)


class ServingReplica:
    """Request-independent serving state, built once per process.

    ``ivf_index`` / ``pq_index`` should wrap the CACHED read-back of a
    saved ``partitionBy("cluster_id")`` layout (the warm-replica
    startup cost, paid outside any request); ``docs`` is the cached
    hydration table keyed by ``doc_id_col``.

    A replica constructed with a ``ReplicaSource`` (or via
    ``from_source``) additionally supports the live-index lifecycle:
    ``is_stale()`` fingerprints the layout's data-file listing against
    the one captured at the last (re)build, and ``refresh()`` re-reads
    + re-caches the layout, codebooks, centroids and hydration table
    in place -- the warm replica sees post-startup
    ``merge_into_table`` / ``stream_merge_into_ivf_index`` /
    ``recluster_ivf_index`` results without a restart, closing the
    reference's STREAM_UPDATE serving semantic. Call ``refresh`` from
    the maintenance thread between request windows: in-flight queries
    keep the OLD cached plans, and if the maintenance pass physically
    replaced files (dynamic partition overwrite), a concurrent query
    that misses cache can fail on a vanished file -- the same exposure
    any file-level swap has (the ACID-format seam closes it).
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
        source: ReplicaSource | None = None,
    ) -> None:
        self.spark = spark
        # Serving state lives in ONE tuple swapped by a single
        # reference assignment (atomic in CPython): a request thread
        # racing refresh() reads either the old generation or the new
        # one, never a MIXED (new ivf, old pq) pair -- cluster ids
        # would silently disagree. The ivf/pq/docs attributes are
        # properties over it for compatibility.
        self._state = (ivf_index, pq_index, docs)
        self.dim = dim
        self.max_tokens = max_tokens
        self.doc_id_col = doc_id_col
        self.hydrate_cols = hydrate_cols
        self.source = source
        self._layout_fingerprint: tuple | None = None
        self._owned_cached: list[DataFrame] = []
        # The one-row query relation's schema, fixed per replica.
        self._q_schema = (
            "query_id string, query_vector array<float>"
        )

    @property
    def ivf(self):
        return self._state[0]

    @property
    def pq(self):
        return self._state[1]

    @property
    def docs(self):
        return self._state[2]

    @classmethod
    def from_source(
        cls,
        spark: SparkSession,
        source: ReplicaSource,
        **kwargs,
    ) -> "ServingReplica":
        """Build a warm replica from a durable layout: reads, caches
        and fingerprints everything ``source`` describes (the startup
        cost a deployed endpoint pays once, config.py:44-50)."""
        replica = cls(spark, None, None, None, source=source, **kwargs)
        replica.refresh()
        return replica

    def _current_fingerprint(self) -> tuple:
        from ..sources.compact import _listing_snapshot
        from ..sources.txlog import TxLog

        def _one(p):
            # a tx table's identity is its committed version -- O(1)
            # to probe (one small-dir listing) vs the recursive
            # data-file walk, and immune to unvacuumed garbage
            log = TxLog(self.spark, p)
            if log.exists():
                return ("txv", log.current_version())
            return _listing_snapshot(self.spark, p)

        return tuple(_one(p) for p in self.source.snapshot_paths())

    def is_stale(self) -> bool:
        """True when any source path's committed data-file listing
        differs from the fingerprint captured at the last refresh --
        the engine's ``index_sync_time`` probe (index_manager.py:
        140-166: deployment state is derived from sync observability,
        not assumed)."""
        if self.source is None:
            raise ValueError(
                "is_stale() needs a ReplicaSource; this replica was "
                "built from static DataFrames"
            )
        return self._current_fingerprint() != self._layout_fingerprint

    def refresh(self) -> dict:
        """Re-warm the resident state from the source layout: re-read
        (listing-cache refreshed) + re-cache the vectors, codes and
        hydration table, re-resolve centroids and codebooks, then swap
        all references at once and unpersist the previous generation.
        The fingerprint is taken BEFORE the reads, so a writer
        committing mid-refresh leaves ``is_stale()`` True and the next
        maintenance tick re-warms again (never a silently-missed
        update). Returns ``{"n_vectors", "n_codes", "n_clusters"}``
        -- refresh cost is one read+cache pass, a fraction of the cold
        build (no KMeans/PQ training, no encode)."""
        if self.source is None:
            raise ValueError(
                "refresh() needs a ReplicaSource; this replica was "
                "built from static DataFrames"
            )
        from .ivf import IVFIndex, load_centroids
        from .pq import PQIndex

        src = self.source
        spark = self.spark
        fingerprint = self._current_fingerprint()

        from ..sources.txlog import read_table_any

        owned: list[DataFrame] = []
        assigned = read_table_any(spark, src.vectors_path).cache()
        n_vectors = assigned.count()
        owned.append(assigned)
        if callable(src.centroids):
            centroids = np.ascontiguousarray(
                src.centroids(), dtype=np.float64
            )
        elif src.centroids is not None:
            centroids = np.ascontiguousarray(
                src.centroids, dtype=np.float64
            )
        else:
            centroids = load_centroids(spark, src.vectors_path)
        new_ivf = IVFIndex(
            assigned=assigned, centroids=centroids,
            id_col=src.id_col, vec_col=src.vec_col,
        )

        new_pq = None
        n_codes = 0
        if src.codes_path:
            codes = read_table_any(spark, src.codes_path).cache()
            n_codes = codes.count()
            owned.append(codes)
            books = src.books() if callable(src.books) else src.books
            new_pq = PQIndex(codes=codes, books=books, id_col=src.id_col)

        new_docs = None
        if callable(src.docs):
            # the docs loader reads paths OUTSIDE vectors/codes: refresh
            # their listing caches too, or the loader can re-read a
            # stale listing after is_stale() correctly flagged the
            # change and re-cache the old rows (r15, ADVICE r14 low)
            for p in src.extra_paths:
                spark.catalog.refreshByPath(p)
            new_docs = src.docs(spark).cache()
            new_docs.count()
            owned.append(new_docs)
        elif src.docs is not None:
            new_docs = src.docs

        previous = self._owned_cached
        self._state = (new_ivf, new_pq, new_docs)  # single atomic swap
        self._owned_cached = owned
        self._layout_fingerprint = fingerprint
        # Unpersist the previous generation UNLESS it shares a cache
        # entry with the new one: Spark's CacheManager keys on the
        # CANONICALIZED plan, and a re-read of the same path
        # canonicalizes equal to the old read (refreshByPath already
        # swapped that entry's file listing in place) -- unpersisting
        # the old DataFrame would evict the cache the NEW replica is
        # using, silently de-warming every subsequent query.
        for df in previous:
            try:
                old_plan = df._jdf.queryExecution().analyzed()
                if any(
                    old_plan.sameResult(
                        nw._jdf.queryExecution().analyzed()
                    )
                    for nw in owned
                ):
                    continue
            except Exception:  # noqa: BLE001 -- eviction is best-effort
                pass
            df.unpersist(blocking=False)
        return {
            "n_vectors": int(n_vectors),
            "n_codes": int(n_codes),
            "n_clusters": int(centroids.shape[0]),
        }

    def refresh_if_stale(self) -> bool:
        """One maintenance tick: re-warm only when the layout moved.
        Returns True when a refresh ran."""
        if self.is_stale():
            self.refresh()
            return True
        return False

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

        ivf, pq, docs = self._state  # one generation, racing refresh
        qvec = self.query_vector_df(doc_id, text)
        hits = ivf_pq_search(
            ivf, pq, qvec, k,
            probe_percent=probe_percent,
            rerank_candidates=rerank_candidates,
            method="broadcast",
            restrict=restrict,
            per_crowding_k=per_crowding_k,
            crowding_col=crowding_col,
        )
        if docs is None:
            return hits
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
        ivf, pq, docs = self._state  # one generation, racing refresh
        hits = ivf_pq_search(
            ivf, pq, qdf, k,
            probe_percent=probe_percent,
            rerank_candidates=rerank_candidates,
            method="broadcast",
            restrict=restrict,
            per_crowding_k=per_crowding_k,
            crowding_col=crowding_col,
        )
        if docs is not None:
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
