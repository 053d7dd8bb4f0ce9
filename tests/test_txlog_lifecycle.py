"""Tx-table lifecycle: the whole STREAM_UPDATE maintenance surface
(streaming merge -> compaction -> recluster -> serving refresh) driven
through the transactional commit log (VERDICT r14 #1). The legacy
listing-and-marker protocol documented a residual ms-scale race; these
gates pin that the unified tx route (a) is bit-equal to the legacy
route on content, (b) never loses a concurrent epoch to maintenance,
and (c) keeps every reader on committed snapshots throughout.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.sources.txlog import (
    TxLog,
    read_table_any,
    tx_append,
)

pytestmark = pytest.mark.full

SCHEMA = "doc_id long, text string"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tx_streaming_sink_matches_legacy_and_is_replay_safe(
    spark, tmp_path
):
    """stream_merge_into_index(txlog=True) must land the same table
    content as the legacy dynamic-overwrite sink, with one manifest
    commit per non-empty epoch carrying the (checkpoint, epoch) txn."""
    from rag_vertex_ai_vector_search_spark.streaming.ingest import (
        stream_merge_into_index,
    )

    batches = [
        [(i, f"first doc {i}") for i in range(12)],
        [(i, f"changed doc {i}") for i in range(4)]
        + [(i, f"new doc {i}") for i in (30, 31)],
    ]

    paths = {}
    for mode, use_tx in (("legacy", False), ("tx", True)):
        src = str(tmp_path / f"in_{mode}")
        index_path = str(tmp_path / f"index_{mode}")
        ckpt = str(tmp_path / f"ckpt_{mode}")
        spark.createDataFrame(batches[0], SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = stream_merge_into_index(
            spark.readStream.schema(SCHEMA).parquet(src),
            index_path,
            checkpoint_dir=ckpt,
            dim=16,
            n_buckets=4,
            txlog=use_tx,
        )
        try:
            q.processAllAvailable()
            spark.createDataFrame(
                batches[1], SCHEMA
            ).coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
        finally:
            q.stop()
        paths[mode] = index_path

    legacy = spark.read.parquet(paths["legacy"]).drop("created_at")
    txdf = read_table_any(spark, paths["tx"]).drop("created_at")
    assert _rows(txdf.select(sorted(txdf.columns))) == _rows(
        legacy.select(sorted(legacy.columns))
    )

    log = TxLog(spark, paths["tx"])
    metas = [
        log.snapshot(v).get("meta") or {}
        for v in range(1, log.current_version() + 1)
    ]
    assert [m.get("txn_batch") for m in metas] == [0, 1]

    # storage-level replay guard: re-committing epoch 1 is a no-op
    from rag_vertex_ai_vector_search_spark.sources.txlog import tx_merge

    before = log.current_version()
    got = tx_merge(
        spark,
        paths["tx"],
        txdf.limit(1),
        n_buckets=4,
        meta={
            "txn_app": str(tmp_path / "ckpt_tx"),
            "txn_batch": 1,
        },
    )
    assert got <= before and log.current_version() == before


def test_tx_ivf_stream_with_concurrent_maintenance(spark, tmp_path):
    """The stop-the-stream restriction, closed by protocol: compaction
    runs BETWEEN epochs of a LIVE tx IVF stream (writer_active=True)
    and every epoch's rows survive -- the legacy path could only
    optimistically abort; the tx path commutes appends through."""
    from rag_vertex_ai_vector_search_spark.streaming.ivf_stream import (
        stream_merge_into_ivf_index,
    )
    from rag_vertex_ai_vector_search_spark.streaming.maintenance import (
        maintain_index,
    )

    rng = np.random.RandomState(7)
    centroids = rng.randn(4, 8)
    src = str(tmp_path / "incoming")
    index_path = str(tmp_path / "ivf_index")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(i, f"first doc {i}") for i in range(40)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    q = stream_merge_into_ivf_index(
        spark.readStream.schema(SCHEMA).parquet(src),
        index_path,
        centroids,
        checkpoint_dir=ckpt,
        dim=8,
        n_buckets=4,
        txlog=True,
    )
    try:
        q.processAllAvailable()
        # maintenance against the live stream's table: tx route
        report = maintain_index(
            spark,
            index_path,
            centroids,
            writer_active=True,
            min_age_seconds=0.0,
            target_file_bytes=1 << 30,
        )
        assert report["compact_error"] is None
        assert "vacuum" in report["gc"]
        # second epoch lands AFTER the compaction rewrote the layout
        spark.createDataFrame(
            [(i, f"new doc {i}") for i in range(100, 120)], SCHEMA
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    final = read_table_any(spark, index_path)
    assert final.count() == 60
    assert final.select("data_point_id").distinct().count() == 60
    # the manifest is the truth: physical dir may hold unvacuumed
    # replaced files, the snapshot read never double-counts
    log = TxLog(spark, index_path)
    n_files, _ = log.table_stats()
    assert n_files == len(log.live_files())


def test_tx_recluster_preserves_rows_and_serving_refresh(
    spark, tmp_path
):
    """recluster_ivf_index on a tx table: one manifest commit replaces
    the flagged leaves' files (no stale-dir witness protocol), the
    full row set is preserved, the _centroids sidecar is rewritten,
    and a ReplicaSource-backed replica refreshes through the tx
    snapshot (version-number fingerprint)."""
    from rag_vertex_ai_vector_search_spark.operators.ivf import (
        load_centroids,
        save_centroids,
    )
    from rag_vertex_ai_vector_search_spark.operators.serving import (
        ReplicaSource,
        ServingReplica,
    )
    from rag_vertex_ai_vector_search_spark.streaming.ivf_stream import (
        recluster_ivf_index,
    )

    rng = np.random.RandomState(11)
    # two tight blobs assigned to ONE leaf -> oversized + drifted
    blob_a = rng.randn(60, 8) * 0.05 + 3.0
    blob_b = rng.randn(60, 8) * 0.05 - 3.0
    vecs = np.vstack([blob_a, blob_b])
    centroids = np.asarray([[3.0] * 8, [100.0] * 8])

    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "data_point_id": [f"d{i}" for i in range(120)],
                "feature_vector": [
                    [float(x) for x in v] for v in vecs
                ],
                "cluster_id": [0] * 120,
            }
        ),
        "data_point_id string, feature_vector array<double>, "
        "cluster_id int",
    )
    index_path = str(tmp_path / "index")
    tx_append(
        spark, index_path, df.repartition(4),
        partition_cols=("cluster_id",),
    )
    save_centroids(spark, index_path, centroids)

    before = _rows(
        read_table_any(spark, index_path).select(
            "data_point_id", "feature_vector"
        )
    )
    src = ReplicaSource(vectors_path=index_path)
    rep = ServingReplica.from_source(spark, src, dim=8)
    fp0 = rep._layout_fingerprint
    assert fp0[0][0] == "txv"  # version-number fingerprint, not listing

    new_cent = recluster_ivf_index(
        spark,
        index_path,
        centroids,
        max_leaf_rows=50,
        max_drift_fraction=0.2,
        seed=5,
    )
    assert new_cent.shape[0] > centroids.shape[0]  # leaf split
    log = TxLog(spark, index_path)
    assert log.snapshot()["action"] == "recluster"

    after = read_table_any(spark, index_path)
    assert _rows(
        after.select("data_point_id", "feature_vector")
    ) == before  # row set unchanged, only the partition map refined
    assert after.select("cluster_id").distinct().count() > 1
    # sidecar followed the rewrite
    assert np.array_equal(load_centroids(spark, index_path), new_cent)

    assert rep.is_stale()
    report = rep.refresh()
    assert report["n_clusters"] == new_cent.shape[0]
    assert not rep.is_stale()


def test_compact_and_zorder_auto_route_through_txlog(spark, tmp_path):
    """compact_parquet / zorder_table on a table carrying a _txlog
    must go through the log (no marker files, a new manifest version)
    -- mixing the listing-based swap into a tx table would commit
    files no manifest references."""
    import os

    from rag_vertex_ai_vector_search_spark.operators.layout import (
        zorder_table,
    )
    from rag_vertex_ai_vector_search_spark.sources import compact_parquet

    path = str(tmp_path / "t")
    df = spark.range(0, 2000).select(
        "id", (F.col("id") % 31).alias("a"), (F.col("id") % 37).alias("b")
    )
    tx_append(spark, path, df.repartition(8))
    log = TxLog(spark, path)
    v1 = log.current_version()

    n = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert n == 1 and log.current_version() == v1 + 1
    assert log.snapshot()["action"] == "compact"

    assert zorder_table(spark, path, ["a", "b"], n_files=4)
    assert log.snapshot()["action"] == "zorder"
    assert _rows(read_table_any(spark, path)) == _rows(df)
    # no legacy swap artifacts anywhere
    sibling = os.listdir(os.path.dirname(path))
    assert all("__compact" not in s for s in sibling)


def test_merge_into_table_txlog_matches_parquet_route(spark, tmp_path):
    from rag_vertex_ai_vector_search_spark.operators.upsert import (
        merge_into_table,
    )

    base = spark.range(0, 300).select(
        F.col("id").cast("string").alias("data_point_id"),
        (F.col("id") * 2).alias("v"),
    )
    ups = spark.range(250, 400).select(
        F.col("id").cast("string").alias("data_point_id"),
        (F.col("id") * 7).alias("v"),
    )
    p_plain = str(tmp_path / "plain")
    p_tx = str(tmp_path / "tx")
    for path, fmt in ((p_plain, "parquet"), (p_tx, "txlog")):
        merge_into_table(spark, path, base, fmt=fmt, n_buckets=8)
        # second merge auto-routes from fmt="parquet" on the tx table
        merge_into_table(spark, path, ups, fmt="parquet", n_buckets=8)
    want = _rows(spark.read.parquet(p_plain).drop("_bucket"))
    got = _rows(read_table_any(spark, p_tx).drop("_bucket"))
    assert got == want
    assert TxLog(spark, p_tx).current_version() >= 2
    # layout pinning still enforced on the tx route
    with pytest.raises(ValueError, match="layout mismatch"):
        merge_into_table(spark, p_tx, ups, fmt="parquet", n_buckets=16)


_TX_WRITER_SCRIPT = r"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

path, n_batches, rows_per = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .appName("second-tx-writer")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from rag_vertex_ai_vector_search_spark.sources.txlog import tx_append

for b in range(n_batches):
    rows = [
        (f"w{b}_{i}", [float(b % 7), float(i % 5)] + [0.0] * 6, int(b % 2))
        for i in range(rows_per)
    ]
    tx_append(
        spark,
        path,
        spark.createDataFrame(
            rows,
            "data_point_id string, feature_vector array<double>, "
            "cluster_id int",
        ).coalesce(1),
        partition_cols=("cluster_id",),
    )
    time.sleep(0.05)
print("WRITER_DONE")
spark.stop()
"""


def test_tx_two_session_writer_never_loses_a_commit(spark, tmp_path):
    """The two-session contract on the TX protocol: a second
    SparkSession in its own JVM runs real tx appends while this
    session loops maintenance (compaction + vacuum) against the same
    table. Unlike the legacy listing protocol -- whose live-mode
    compactions could only optimistically ABORT when the foreign
    writer committed mid-rewrite -- the tx rewrite re-validates and
    REBASES through concurrent appends, so compactions land under
    load and zero rows are lost or duplicated across every
    interleaving, including hard publish races between two JVMs on
    the same version slot (one hard-link wins, the loser rebases)."""
    import subprocess
    import sys as _sys
    import time

    from rag_vertex_ai_vector_search_spark.streaming.maintenance import (
        maintain_index,
    )

    path = str(tmp_path / "t")
    seed = spark.createDataFrame(
        [
            (f"s{i}", [float(i % 7), float(i % 5)] + [0.0] * 6, i % 2)
            for i in range(40)
        ],
        "data_point_id string, feature_vector array<double>, "
        "cluster_id int",
    )
    tx_append(
        spark, path, seed.repartition(8), partition_cols=("cluster_id",)
    )

    script = str(tmp_path / "writer.py")
    with open(script, "w") as fh:
        fh.write(_TX_WRITER_SCRIPT)
    n_batches, rows_per = 24, 5
    proc = subprocess.Popen(
        [_sys.executable, script, path, str(n_batches), str(rows_per)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    reports = []
    try:
        deadline = time.time() + 180
        while proc.poll() is None and time.time() < deadline:
            reports.append(
                maintain_index(
                    spark, path, None,
                    writer_active=True,
                    min_age_seconds=24 * 3600,
                    target_file_bytes=1 << 20,
                )
            )
        out, _ = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert "WRITER_DONE" in out
    assert len(reports) >= 2  # maintenance genuinely overlapped writes
    reports.append(
        maintain_index(
            spark, path, None, writer_active=False,
            min_age_seconds=24 * 3600, target_file_bytes=1 << 20,
        )
    )

    final = read_table_any(spark, path)
    ids = sorted(r.data_point_id for r in final.collect())
    want = sorted(
        [f"s{i}" for i in range(40)]
        + [f"w{b}_{i}" for b in range(n_batches) for i in range(rows_per)]
    )
    assert ids == want  # zero lost, zero duplicated, both sessions
    # manifest consistency: every live file exists, stats agree
    import os

    log = TxLog(spark, path)
    rels = log.live_files()
    assert all(os.path.exists(os.path.join(log.table, r)) for r in rels)
    assert log.table_stats()[0] == len(rels)
    # compaction genuinely landed under the live writer at least once
    actions = [
        log.snapshot(v)["action"]
        for v in range(0, log.current_version() + 1)
    ]
    assert any(a in ("compact", "compact-fragmented") for a in actions)
