"""Tx-log high-file-count microbench (r16, VERDICT r15 #8): validate
the O(delta) commit claim where it matters -- a manifest at ~10^5
files. Measures, as the manifest grows 10^3 -> 10^5 entries:

- per-commit latency, split delta commits (O(batch) JSON) vs
  CHECKPOINT commits (full live-list JSON, every
  CHECKPOINT_INTERVAL-th version);
- snapshot() resolve time at head (nearest checkpoint read +
  <= CHECKPOINT_INTERVAL-1 delta replays);
- find_txn probe time over the full version history;
- tx_vacuum wall over a dir physically holding the 10^5 files
  (the age-gated walk stats every file).

Manifest entries are synthetic (append_files never opens data files);
only the vacuum step materializes real (empty) files. Paste the JSON
into SCALE.md.

    python scripts/txlog_microbench.py [workdir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from rag_vertex_ai_vector_search_spark.sources.txlog import (  # noqa: E402
    CHECKPOINT_INTERVAL,
    TxLog,
    tx_vacuum,
)

BATCH = int(os.environ.get("TXLOG_UBENCH_BATCH", "1000"))
N_BATCHES = int(os.environ.get("TXLOG_UBENCH_BATCHES", "100"))
# default -> 10^5 manifest entries over 100 versions; BATCH=10000 -> 10^6


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="txlog_ubench_"
    )
    table = os.path.join(work, "t")
    log = TxLog(None, table)
    log.init(adopt_listing=False)

    delta_ms: list[tuple[int, float]] = []   # (manifest_size, ms)
    ckpt_ms: list[tuple[int, float]] = []
    for b in range(N_BATCHES):
        entries = [
            {"path": f"part={b % 16}/tx-{b:04d}-{i:05d}.parquet",
             "size": 1_000_000}
            for i in range(BATCH)
        ]
        t0 = time.perf_counter()
        v = log.append_files(
            entries, meta={"txn_app": "ubench", "txn_batch": b}
        )
        ms = (time.perf_counter() - t0) * 1000
        size = (b + 1) * BATCH
        (ckpt_ms if v % CHECKPOINT_INTERVAL == 0 else delta_ms).append(
            (size, ms)
        )

    TOTAL = N_BATCHES * BATCH

    def _at(points, lo, hi):
        sel = [m for s, m in points if lo <= s <= hi]
        return round(sum(sel) / len(sel), 1) if sel else None

    t0 = time.perf_counter()
    snap = log.snapshot()
    snapshot_ms = round((time.perf_counter() - t0) * 1000, 1)
    assert len(snap["files"]) == N_BATCHES * BATCH

    t0 = time.perf_counter()
    assert log.find_txn("ubench", 0) == 1  # worst case: oldest epoch
    find_txn_ms = round((time.perf_counter() - t0) * 1000, 1)

    # materialize the physical files so the vacuum walk is real
    t0 = time.perf_counter()
    for rel in log.live_files():
        full = os.path.join(table, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        open(full, "wb").close()
    materialize_s = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    rep = tx_vacuum(None, table, retain_versions=2, min_age_seconds=0)
    vacuum_s = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    pruned = tx_vacuum(
        None, table, retain_versions=2, min_age_seconds=0,
        prune_log=True,
    )["pruned_commits"]
    prune_s = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    log.snapshot()
    snapshot_after_prune_ms = round((time.perf_counter() - t0) * 1000, 1)
    t0 = time.perf_counter()
    replay = log.find_txn("ubench", 0)  # now answered by the txn index
    find_txn_pruned_ms = round((time.perf_counter() - t0) * 1000, 1)
    assert replay == 1

    print(json.dumps({
        "metric": "txlog_microbench",
        "files": N_BATCHES * BATCH,
        "versions": N_BATCHES,
        "delta_commit_ms": {
            "early": _at(delta_ms, 0.01 * TOTAL, 0.10 * TOTAL),
            "mid": _at(delta_ms, 0.40 * TOTAL, 0.60 * TOTAL),
            "late": _at(delta_ms, 0.90 * TOTAL, 1.00 * TOTAL),
        },
        "checkpoint_commit_ms": {
            "early": _at(ckpt_ms, 1, 0.15 * TOTAL),
            "mid": _at(ckpt_ms, 0.45 * TOTAL, 0.55 * TOTAL),
            "late": _at(ckpt_ms, 0.90 * TOTAL, 1.00 * TOTAL),
        },
        "snapshot_resolve_ms": snapshot_ms,
        "find_txn_full_history_ms": find_txn_ms,
        "vacuum_walk_s": vacuum_s,
        "vacuum_deleted": rep["deleted_files"],
        "materialize_s": materialize_s,
        "pruned_commits": pruned,
        "prune_s": prune_s,
        "snapshot_after_prune_ms": snapshot_after_prune_ms,
        "find_txn_via_index_ms": find_txn_pruned_ms,
    }))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
