"""The r17 object-store commit path (VERDICT r16 #1): a pluggable
``LogStore`` provides the put-if-absent claim on schemes whose rename
OVERWRITES (S3-class stores). This module proves the full protocol --
roundtrip, thread races, crash kills, merge/vacuum/prune, exactly-once
replay -- through an FS shim that faithfully simulates S3 semantics:

- ``rename`` silently replaces an existing destination (copy+delete);
- there is NO hard link and NO atomic create-if-absent, so the claim
  MUST route through the configured coordinator
  (``SingleDriverLogStore``, Delta's S3SingleDriverLogStore analog);
- an UNCONFIGURED scheme keeps the loud r16 contract: reads and
  staging work, the commit raises ``NotImplementedError``.
"""

import os
from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.sources import txlog as tx
from rag_vertex_ai_vector_search_spark.sources.logstore import (
    SingleDriverLogStore,
    configure_log_store,
    unconfigure_log_store,
)
from rag_vertex_ai_vector_search_spark.sources.txlog import (
    TxConflict,
    TxLog,
    read_table,
    read_table_any,
    tx_append,
    tx_compact,
    tx_merge,
    tx_vacuum,
)

SCHEME = "s3mock"


class _S3SimFs(tx._LocalTxFs):
    """S3-semantics shim over a local directory: the paths carry a
    ``s3mock:`` scheme, rename overwrites silently, and there is no
    put-if-absent primitive -- the claim must go through a LogStore."""

    scheme = SCHEME

    def normalize(self, path: str) -> str:
        assert path.startswith(f"{SCHEME}:")
        return path[len(SCHEME) + 1:].rstrip("/")

    def rename(self, src: str, dst: str) -> None:
        os.replace(src, dst)  # S3 "rename": replaces dst if present

    def publish_if_absent(self, log_dir, final, payload) -> None:
        tx._claim_via_log_store(self, log_dir, final, payload)


@pytest.fixture()
def s3mock():
    tx.register_tx_fs(SCHEME, lambda spark, path: _S3SimFs())
    configure_log_store(SCHEME, SingleDriverLogStore())
    yield
    tx.unregister_tx_fs(SCHEME)
    unconfigure_log_store(SCHEME)


def _uri(tmp_path, name="t") -> str:
    return f"{SCHEME}:{tmp_path}/{name}"


def _range_df(spark, lo, hi, parts=2):
    return (
        spark.range(lo, hi)
        .withColumn("v", F.col("id") * 2)
        .repartition(parts)
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_shim_rename_really_overwrites(tmp_path, s3mock):
    """Primitive faithfulness: the simulated store's rename replaces an
    existing destination silently -- the exact hazard the LogStore
    exists to guard (an unguarded claim would lose a commit)."""
    fs = _S3SimFs()
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for p, body in ((a, b"AAA"), (b, b"BBB")):
        with open(p, "wb") as f:
            f.write(body)
    fs.rename(a, b)  # no error, no EEXIST -- B's bytes are gone
    assert open(b, "rb").read() == b"AAA"


def test_append_read_roundtrip_time_travel(spark, tmp_path, s3mock):
    path = _uri(tmp_path)
    v1 = tx_append(spark, path, _range_df(spark, 0, 100))
    v2 = tx_append(spark, path, _range_df(spark, 100, 150))
    assert (v1, v2) == (1, 2)
    assert read_table(spark, path).count() == 150
    assert read_table(spark, path, version=1).count() == 100
    log = TxLog(spark, path)
    n_files, total = log.table_stats()
    assert n_files == len(log.live_files()) and total > 0


def test_publish_one_winner_through_logstore(spark, tmp_path, s3mock):
    path = _uri(tmp_path)
    tx_append(spark, path, _range_df(spark, 0, 10))
    log = TxLog(spark, path)
    v = log.current_version()
    doc = log.snapshot(v)
    log._publish(v + 1, doc)
    final = os.path.join(str(tmp_path / "t"), tx.TXLOG_DIR,
                         f"v{v + 1:020d}.json")
    winner_bytes = open(final, "rb").read()
    with pytest.raises(TxConflict):
        log._publish(v + 1, {**doc, "meta": {"loser": True}})
    # the loser's claim did not OVERWRITE the winner's commit file
    assert open(final, "rb").read() == winner_bytes


def test_many_threads_append_all_commits_land(spark, tmp_path, s3mock):
    """The thread-race stress: the claim is the LogStore's in-process
    mutex + exists-check, so exactly one writer wins each slot and no
    commit is silently overwritten by the S3 rename."""
    path = _uri(tmp_path)
    TxLog(spark, path).ensure()

    def writer(w):
        for b in range(6):
            lo = (w * 6 + b) * 10
            tx_append(spark, path, _range_df(spark, lo, lo + 10, parts=1))
        return w

    with ThreadPoolExecutor(max_workers=4) as ex:
        assert sorted(ex.map(writer, range(4))) == [0, 1, 2, 3]

    log = TxLog(spark, path)
    assert log.current_version() == 24
    got = read_table(spark, path)
    assert got.count() == 240
    assert got.select("id").distinct().count() == 240


def test_crash_matrix_reader_never_corrupted(spark, tmp_path, s3mock, monkeypatch):
    path = _uri(tmp_path)
    tx_append(spark, path, _range_df(spark, 0, 100))
    want = _rows(read_table(spark, path))

    # (a) crash after the scratch write, before any move-in
    real_walk = _S3SimFs.walk_files

    def boom_walk(self, root, **k):
        if tx._STAGE_PREFIX in str(root):
            raise RuntimeError("killed before move-in")
        return real_walk(self, root, **k)

    monkeypatch.setattr(_S3SimFs, "walk_files", boom_walk)
    with pytest.raises(RuntimeError, match="before move-in"):
        tx_append(spark, path, _range_df(spark, 100, 120))
    monkeypatch.undo()
    assert _rows(read_table(spark, path)) == want

    # (b) crash after move-in, before the manifest commit
    new = tx._stage_and_move_in(spark, path, _range_df(spark, 100, 120))
    assert len(new) > 0  # files physically in the table dir...
    assert _rows(read_table(spark, path)) == want  # ...but invisible

    # (c) vacuum through the shim reaps exactly the orphans
    rep = tx_vacuum(spark, path, retain_versions=100, min_age_seconds=0)
    assert rep["deleted_files"] == len(new)
    assert _rows(read_table(spark, path)) == want


def test_merge_vacuum_and_prune(spark, tmp_path, s3mock):
    path = _uri(tmp_path)
    base = spark.range(0, 200).select(
        F.col("id").alias("data_point_id"), F.lit("old").alias("payload")
    )
    tx_merge(spark, path, base, n_buckets=8)
    updates = spark.range(150, 260).select(
        F.col("id").alias("data_point_id"), F.lit("new").alias("payload")
    )
    tx_merge(spark, path, updates, n_buckets=8)
    got = read_table_any(spark, path)
    assert got.count() == 260
    assert got.filter(
        (F.col("data_point_id") >= 150) & (F.col("payload") != "new")
    ).count() == 0
    rep = tx_vacuum(
        spark, path, retain_versions=1, min_age_seconds=0, prune_log=True
    )
    assert rep["deleted_files"] > 0
    assert read_table(spark, path).count() == 260


def test_concurrent_append_survives_compaction(spark, tmp_path, s3mock, monkeypatch):
    path = _uri(tmp_path)
    tx_append(spark, path, _range_df(spark, 0, 1000, parts=8))
    late = _range_df(spark, 1000, 1040, parts=1)
    real_replace = TxLog.replace_files

    def inject_then_commit(self, inputs, outputs, **k):
        monkeypatch.undo()
        tx_append(spark, path, late)
        return real_replace(self, inputs, outputs, **k)

    monkeypatch.setattr(TxLog, "replace_files", inject_then_commit)
    tx_compact(
        spark, path, target_file_bytes=1 << 30, min_files_to_compact=2
    )
    assert read_table(spark, path).count() == 1040


def test_zombie_replay_exactly_once(spark, tmp_path, s3mock, monkeypatch):
    """Two replays of the same epoch racing through the LogStore claim
    resolve to one application."""
    path = _uri(tmp_path)
    tx_append(spark, path, _range_df(spark, 0, 50))
    epoch = {"txn_app": "app", "txn_batch": 9}
    epoch_df = _range_df(spark, 100, 120, parts=1)
    real_stage = tx._stage_and_move_in
    state = {"fired": False}

    def stage_then_winner_commits(spark_, table, df, *a, **k):
        moved = real_stage(spark_, table, df, *a, **k)
        if not state["fired"]:
            state["fired"] = True
            tx_append(spark, path, epoch_df, meta=dict(epoch))
        return moved

    monkeypatch.setattr(tx, "_stage_and_move_in", stage_then_winner_commits)
    v = tx_append(spark, path, epoch_df, meta=dict(epoch))
    monkeypatch.undo()
    assert v == TxLog(spark, path).find_txn("app", 9)
    assert read_table(spark, path).count() == 70


def test_unconfigured_scheme_stays_loud(spark, tmp_path, s3mock):
    """Reads/staging work without a LogStore; only the claim raises --
    and it names the configuration entry point."""
    path = _uri(tmp_path)
    tx_append(spark, path, _range_df(spark, 0, 30))
    unconfigure_log_store(SCHEME)
    try:
        assert read_table(spark, path).count() == 30  # reads fine
        with pytest.raises(NotImplementedError, match="configure_log_store"):
            tx_append(spark, path, _range_df(spark, 30, 40))
        # nothing half-committed
        assert TxLog(spark, path).current_version() == 1
        assert read_table(spark, path).count() == 30
    finally:
        configure_log_store(SCHEME, SingleDriverLogStore())
