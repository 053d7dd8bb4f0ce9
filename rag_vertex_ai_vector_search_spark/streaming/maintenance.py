"""The nightly maintenance pass, as one idempotent entry point.

The reference's STREAM_UPDATE index is a long-lived serving layout
under continuous ingest (vector_store/utils/index_manager.py:53,
common/config.py:44-50: the index stays queryable while updates
stream). Long-lived plain-parquet layouts accumulate three kinds of
debt, each with its own repo operator:

- crash remnants + interrupted swaps -> ``gc_table_path`` /
  ``resume_pending_compact`` / ``_resume_pending_cleanup``
- small files from per-micro-batch merges -> ``compact_parquet``
- oversized / drifted leaves from sticky assignment ->
  ``cluster_drift_report`` + ``recluster_ivf_index``

``maintain_index`` composes them in dependency order (heal -> GC ->
compact -> observe drift -> recluster) behind ONE idempotent call a
scheduler can fire nightly. Concurrency contract, by operation:

- **Heal + GC are live-safe**: healing only touches marker-protocol'd
  state no live writer owns, and every GC delete is age-gated on the
  victim subtree's newest mtime, so a live writer's in-flight
  ``_temporary``/staging dir is never raced (pass ``min_age_seconds=0``
  only with writers known stopped).
- **Compaction in live mode runs optimistically**
  (``abort_if_changed``): the rewrite is abandoned if any writer
  committed between the read and the swap, so a concurrent
  micro-batch is never lost -- worst case the pass reports
  ``compacted=False`` and the next pass retries on a colder table.
- **Recluster is DEFERRED while a writer is active**: its rewrite is a
  multi-second dynamic-overwrite JOB over the touched leaves, and a
  merge committing one of those leaves mid-job would be silently
  undone -- there is no cheap optimistic check around a window that
  long on plain parquet (the Delta/Iceberg conflict-detection seam is
  where that becomes safe). The pass still computes and returns the
  drift signal, so the orchestrator pauses the stream at the NEXT
  batch boundary and re-runs with ``writer_active=False`` -- exactly
  the stop -> maintain -> resume-from-checkpoint loop that
  checkpoint-restart recovery (tests/test_streaming_recovery.py)
  makes lossless.

Everything here is bounded driver work: listings, n_clusters-sized
drift rows, and the budget-capped recluster sample -- nothing scales
with table rows.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession

from ..sources.compact import (
    DEFAULT_TARGET_FILE_BYTES,
    compact_fragmented,
    compact_parquet,
    gc_table_path,
    table_file_stats,
)
from .ivf_stream import (
    _resume_pending_cleanup,
    cluster_drift_report,
    needs_recluster,
    recluster_ivf_index,
)


def maintain_index(
    spark: SparkSession,
    index_path: str,
    centroids: np.ndarray | None = None,
    *,
    writer_active: bool = False,
    min_age_seconds: float = 24 * 3600.0,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    max_leaf_rows: int = 500,
    max_drift_fraction: float = 0.2,
    vec_col: str = "feature_vector",
    id_col: str = "data_point_id",
    recluster_kwargs: dict | None = None,
    tx_retain_versions: int = 2,
    tx_prune_log: bool = False,
) -> dict:
    """One idempotent maintenance pass over an IVF index layout.

    Returns a report dict:

    - ``gc``: the ``gc_table_path`` report (healed swaps, deleted
      remnant dirs, reclaimed bytes).
    - ``files_before`` / ``files_after``: data-file counts around the
      compaction step; ``compacted`` is True when the count dropped
      (False also covers a live-mode optimistic abort -- retried by
      the next pass). ``compact_error`` / ``drift_error`` carry the
      repr of any live-mode swallowed exception (None when clean), so
      a persistent real fault is distinguishable from an optimistic
      abort in the report.
    - ``recluster_needed`` / ``recluster_ran`` / ``recluster_deferred``:
      the drift verdict and what was done about it. Deferral reasons:
      a live writer (see module docstring) or ``centroids`` not
      provided (the caller owns the centroid matrix lifecycle).
    - ``centroids``: the matrix to hand to subsequent
      ``stream_merge_into_ivf_index`` / search calls -- grown when the
      recluster ran, the input otherwise.

    Idempotent by construction: every step is a no-op on a table the
    previous call left healthy (nothing to heal, nothing aged, file
    count at target, no leaf flagged).

    ``timings`` in the report carries per-step wall seconds (heal_gc /
    compact / drift / recluster) -- the observability a nightly
    scheduler needs to see WHERE a pass spends its budget (and what
    the 10x scale curve records as the GC/compact/recluster split).
    """
    import time as _time

    from ..sources.txlog import TxLog, read_table_any, tx_vacuum

    is_tx = TxLog(spark, index_path).exists()

    def _file_count() -> int:
        # a tx table's dir legitimately holds replaced-but-unvacuumed
        # files: the MANIFEST is the truth a scan pays for, so it is
        # what compaction reasons about
        if is_tx:
            return TxLog(spark, index_path).table_stats()[0]
        return table_file_stats(spark, index_path)[0]

    timings: dict[str, float] = {}
    _t0 = _time.perf_counter()
    # 1. heal: an interrupted recluster cleanup is repaired before
    # anything reads the index (the compact-swap heal runs inside gc).
    # Tx tables have nothing to heal BY CONSTRUCTION (uncommitted
    # state is invisible); their GC is the version-retention vacuum.
    _resume_pending_cleanup(spark, index_path)

    # 2. age-gated GC (also resumes a pending compact swap); for tx
    # tables additionally vacuum files no retained version references
    # (same age gate, so a live writer's staged files are never raced).
    gc_report = gc_table_path(
        spark, index_path, min_age_seconds=min_age_seconds
    )
    if is_tx:
        # tx_prune_log=True additionally bounds the COMMIT LOG by the
        # retention window -- the right default for a per-epoch
        # streaming sink's table once time travel beyond
        # tx_retain_versions is not needed (see txlog.tx_vacuum).
        gc_report = dict(
            gc_report,
            vacuum=tx_vacuum(
                spark,
                index_path,
                retain_versions=tx_retain_versions,
                min_age_seconds=min_age_seconds,
                prune_log=tx_prune_log,
            ),
        )
    timings["heal_gc"] = round(_time.perf_counter() - _t0, 3)
    _t0 = _time.perf_counter()

    # 3. small-file compaction, optimistic when a writer is live. In
    # live mode ANY failure degrades to no-op (report the error, let
    # the next pass retry on a colder table): a concurrent dynamic
    # overwrite can invalidate the scan's file listing mid-job, which
    # is exactly the "someone committed" case the optimistic abort
    # exists for -- it just surfaced as an exception instead of a
    # listing diff.
    files_before = _file_count()
    compact_error = None
    compact_scope = None
    try:
        # defensive listing refresh (r13, two-session contract): every
        # read this pass makes must see the current file set, whatever
        # listing caches the session carries -- see compact_parquet
        spark.catalog.refreshByPath(index_path)
        index_cols = read_table_any(spark, index_path).columns
        parts = tuple(
            c for c in ("_bucket", "cluster_id") if c in index_cols
        )
        if parts and (is_tx or not writer_active):
            # fragmentation-SCOPED pass (r16, VERDICT r15 #3): only
            # partitions past the fragment threshold are rewritten --
            # merge debt concentrates in hot buckets/leaves, so the
            # nightly cost tracks the fragmented fraction, not the
            # table. Tx tables run it live-safely (manifest replace of
            # exactly the fragmented files; concurrent appends
            # commute); plain tables only with the writer paused.
            compact_scope = compact_fragmented(
                spark, index_path, target_file_bytes=target_file_bytes
            )
            files_after = compact_scope["files_after"]
        else:
            files_after = compact_parquet(
                spark,
                index_path,
                target_file_bytes=target_file_bytes,
                partition_cols=parts,
                abort_if_changed=writer_active,
            )
    except Exception as exc:  # noqa: BLE001 -- live-mode optimistic degrade
        if not writer_active:
            raise
        # Keep the exception text: an optimistic abort (stale listing,
        # FileNotFound mid-scan) and a persistent real fault (corrupt
        # footer, permissions) land here alike, and the report is the
        # only place an operator can tell them apart.
        compact_error = (
            f"compaction failed under live writer (aborted, will "
            f"retry next pass): {exc!r}"
        )
        files_after = _file_count()
    timings["compact"] = round(_time.perf_counter() - _t0, 3)
    _t0 = _time.perf_counter()

    # 4. drift observation (read-only; same live-mode degrade).
    needed = False
    drift_error = None
    if centroids is not None:
        try:
            report_df = cluster_drift_report(
                read_table_any(spark, index_path), centroids,
                vec_col=vec_col,
            )
            needed = needs_recluster(
                report_df,
                max_leaf_rows=max_leaf_rows,
                max_drift_fraction=max_drift_fraction,
            )
        except Exception as exc:  # noqa: BLE001 -- live-mode degrade
            if not writer_active:
                raise
            # needed=False is a DEGRADED verdict, not a healthy one --
            # surface the swallowed error so a persistently failing
            # drift read can't report a healthy index forever.
            drift_error = f"drift observation failed under live writer: {exc!r}"
            needed = False

    timings["drift"] = round(_time.perf_counter() - _t0, 3)
    _t0 = _time.perf_counter()

    # 5. rebalance. Plain-parquet tables only in a writer-paused
    # window (see module docstring); TX tables may rebalance UNDER a
    # live writer -- the manifest publish re-validates the rewrite's
    # input files, so a racing epoch aborts the recluster loudly
    # (deferred + error in the report, retried next pass) instead of
    # being silently undone. That closes the stop-the-stream
    # restriction by protocol.
    from ..sources.txlog import TxRewriteAborted

    ran = False
    new_centroids = centroids
    if needed and (not writer_active or is_tx):
        try:
            new_centroids = recluster_ivf_index(
                spark,
                index_path,
                centroids,
                vec_col=vec_col,
                id_col=id_col,
                max_leaf_rows=max_leaf_rows,
                max_drift_fraction=max_drift_fraction,
                **(recluster_kwargs or {}),
            )
            ran = True
        except TxRewriteAborted as exc:
            if not writer_active:
                raise
            drift_error = f"recluster lost the commit race: {exc!r}"
    timings["recluster"] = round(_time.perf_counter() - _t0, 3)

    return {
        "gc": gc_report,
        "files_before": int(files_before),
        "files_after": int(files_after),
        "compacted": files_after < files_before,
        "compact_scope": compact_scope,
        "compact_error": compact_error,
        "drift_error": drift_error,
        "recluster_needed": bool(needed),
        "recluster_ran": ran,
        "recluster_deferred": bool(needed and not ran),
        "centroids": new_centroids,
        "timings": timings,
    }
