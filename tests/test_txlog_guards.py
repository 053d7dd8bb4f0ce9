"""r17 guards closing the ADVICE r16 findings:

- the exactly-once replay probe runs AFTER the base-version read
  inside every commit loop (a replay committing between a pre-loop
  probe and the version read used to be rebased over -- rows twice);
- process-local snapshot/txn caches are purged when a table is
  dropped and RECREATED at the same path (v0 stat-fingerprint
  identity);
- tx_merge re-reads the (key, n_buckets) layout pin on every retry;
- tx_vacuum aborts loudly when the CURRENT version cannot resolve
  (e.g. its checkpoint sidecar was lost) instead of treating it as
  pruned history and deleting the live files;
- plain-path compact_fragmented refuses non-hive fragmented dirs
  (dynamic partition overwrite would degrade to a static root
  overwrite and delete healthy partitions).
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.sources import txlog as tx
from rag_vertex_ai_vector_search_spark.sources.compact import (
    compact_fragmented,
    table_file_stats,
)
from rag_vertex_ai_vector_search_spark.sources.txlog import (
    CHECKPOINT_INTERVAL,
    TxLog,
    TxRewriteAborted,
    read_table,
    tx_append,
    tx_merge,
    tx_vacuum,
)


def _range_df(spark, lo, hi, parts=2):
    return (
        spark.range(lo, hi)
        .withColumn("v", F.col("id") * 2)
        .repartition(parts)
    )


def _ids(spark, path):
    return sorted(
        r[0] for r in read_table(spark, path).select("id").collect()
    )


def test_replay_racing_append_lands_exactly_once(spark, tmp_path, monkeypatch):
    """ADVICE r16 medium: a concurrent replay of the same (txn_app,
    txn_batch) committing between tx_append's pre-staging probe and
    the in-loop base-version read must NOT be rebased over -- the
    loser observes it and returns the winner's version, rows once."""
    path = str(tmp_path / "t")
    tx_append(spark, path, _range_df(spark, 0, 50))
    epoch = {"txn_app": "app", "txn_batch": 3}
    epoch_df = _range_df(spark, 100, 120, parts=1)

    real_stage = tx._stage_and_move_in
    state = {"fired": False}

    def stage_then_winner_commits(spark_, table, df, *a, **k):
        moved = real_stage(spark_, table, df, *a, **k)
        if not state["fired"]:
            state["fired"] = True
            # the winner replay commits AFTER the loser's probe ran
            # (tx_append probes before staging) and BEFORE the loser's
            # commit loop reads its base version
            tx_append(spark, path, epoch_df, meta=dict(epoch))
        return moved

    monkeypatch.setattr(tx, "_stage_and_move_in", stage_then_winner_commits)
    v = tx_append(spark, path, epoch_df, meta=dict(epoch))
    monkeypatch.undo()

    log = TxLog(spark, path)
    assert v == log.find_txn("app", 3)
    got = read_table(spark, path)
    assert got.count() == 70  # 50 base + 20 epoch rows, NOT 90
    assert got.select("id").distinct().count() == 70
    # the loser's staged files were reaped from the manifest
    assert len(log.live_files()) == len(set(log.live_files()))


def test_recreated_table_does_not_serve_stale_caches(spark, tmp_path):
    """ADVICE r16 low: drop a tx table, recreate one at the same path
    in the same process. The snapshot cache must not poison the new
    table's checkpoint (old-table files in the full list) and the txn
    scan cache must not falsely skip the new table's epochs."""
    path = str(tmp_path / "t")
    tx_append(spark, path, _range_df(spark, 0, 30), meta={
        "txn_app": "app", "txn_batch": 0,
    })
    for b in range(1, 4):
        tx_append(spark, path, _range_df(spark, 30 * b, 30 * b + 30))
    # seed the process-local caches with the OLD table's state
    assert read_table(spark, path).count() == 120
    assert TxLog(spark, path).find_txn("app", 0) == 1

    shutil.rmtree(path)

    # new table at the same path; same epoch pair MUST commit (the old
    # table's replay record is dead with the old table)
    v = tx_append(spark, path, _range_df(spark, 0, 10, parts=1), meta={
        "txn_app": "app", "txn_batch": 0,
    })
    assert v == 1
    assert read_table(spark, path).count() == 10
    # drive the new table across a CHECKPOINT: the full list is
    # materialized from cache-replayed maps -- a stale old-table base
    # would bake deleted files into the checkpoint
    for b in range(CHECKPOINT_INTERVAL + 2):
        tx_append(spark, path, _range_df(spark, 10 + b, 11 + b, parts=1))
    got = read_table(spark, path)
    assert got.count() == 10 + CHECKPOINT_INTERVAL + 2
    # every manifest file physically exists (no ghost old-table entries)
    log = TxLog(spark, path)
    for rel in log.live_files():
        assert os.path.exists(os.path.join(path, rel)), rel


def test_tx_merge_rereads_layout_pin_on_retry(spark, tmp_path, monkeypatch):
    """ADVICE r16 low: a first merge that loses its commit race to a
    concurrent FIRST merge with a different (key, n_buckets) must
    abort on retry (the winner's sidecar is now the pin), not scatter
    keys across a mismatched bucket map."""
    from rag_vertex_ai_vector_search_spark.operators.upsert import (
        _write_merge_meta,
    )

    path = str(tmp_path / "t")
    updates = spark.range(0, 40).select(
        F.col("id").alias("data_point_id"), F.lit("x").alias("payload")
    )
    real_replace = TxLog.replace_files
    state = {"fired": False}

    def lose_to_other_layout(self, inputs, outputs, **k):
        if not state["fired"]:
            state["fired"] = True
            # the concurrent first merge wins with n_buckets=16 and
            # writes its pin; this attempt loses its rewrite race
            _write_merge_meta(spark, path, "data_point_id", 16)
            raise TxRewriteAborted("lost to concurrent first merge")
        return real_replace(self, inputs, outputs, **k)

    monkeypatch.setattr(TxLog, "replace_files", lose_to_other_layout)
    with pytest.raises(ValueError, match="layout mismatch"):
        tx_merge(spark, path, updates, n_buckets=8)


def test_vacuum_aborts_when_current_version_unresolvable(spark, tmp_path):
    """ADVICE r16 low: a lost checkpoint sidecar of the CURRENT
    version must abort the vacuum loudly -- swallowing it would
    contribute zero files to the keep-set and delete live data."""
    path = str(tmp_path / "t")
    for b in range(CHECKPOINT_INTERVAL):
        tx_append(spark, path, _range_df(spark, b * 5, b * 5 + 5, parts=1))
    log = TxLog(spark, path)
    v = log.current_version()
    assert v == CHECKPOINT_INTERVAL  # head is a checkpoint version
    doc = log._read_commit(v)
    sidecar = doc.get("checkpoint_file")
    if sidecar is None:
        pytest.skip("pyarrow-less checkpoint embeds files in the JSON")
    os.unlink(os.path.join(path, tx.TXLOG_DIR, sidecar))
    n_before = table_file_stats(spark, path)[0]
    with pytest.raises(FileNotFoundError):
        tx_vacuum(spark, path, retain_versions=1, min_age_seconds=0)
    assert table_file_stats(spark, path)[0] == n_before


def test_vacuum_prune_log_retains_v0(spark, tmp_path):
    """r17: prune_log keeps the v0 commit JSON (the identity anchor)
    while still pruning the versions between it and the retained
    window's checkpoint."""
    path = str(tmp_path / "t")
    for b in range(CHECKPOINT_INTERVAL + 3):
        tx_append(spark, path, _range_df(spark, b * 5, b * 5 + 5, parts=1))
    rep = tx_vacuum(
        spark, path, retain_versions=1, min_age_seconds=0, prune_log=True
    )
    assert rep["pruned_commits"] > 0
    log = TxLog(spark, path)
    versions = [v for v, _n in log._version_files()]
    assert 0 in versions
    # the retained replay chain still resolves
    assert read_table(spark, path).count() == (CHECKPOINT_INTERVAL + 3) * 5


def test_compact_fragmented_refuses_nonhive_layout(spark, tmp_path):
    """ADVICE r16 medium: plain-path compact_fragmented on a non-hive
    (adopted date-tree) layout must refuse instead of degrading to a
    static overwrite that deletes healthy partitions."""
    base = str(tmp_path / "t")
    for d in ("2024/01", "2024/02"):
        for i in range(3):
            spark.range(i * 10, i * 10 + 10).coalesce(1).write.mode(
                "append"
            ).parquet(f"{base}/{d}")
    n_before, bytes_before = table_file_stats(spark, base)
    with pytest.raises(ValueError, match="hive layout"):
        compact_fragmented(
            spark, base, target_file_bytes=1 << 30, min_files_to_compact=2
        )
    assert table_file_stats(spark, base) == (n_before, bytes_before)


def test_compact_fragmented_refuses_mixed_hive_layout(spark, tmp_path):
    """Fragmented dirs that disagree on their hive columns are the
    same hazard: refuse loudly."""
    base = str(tmp_path / "t")
    for d in ("lang=en", "day=2024-01-01"):
        for i in range(3):
            spark.range(i * 10, i * 10 + 10).coalesce(1).write.mode(
                "append"
            ).parquet(f"{base}/{d}")
    with pytest.raises(ValueError, match="hive layout"):
        compact_fragmented(
            spark, base, target_file_bytes=1 << 30, min_files_to_compact=2
        )
