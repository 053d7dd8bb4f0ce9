"""maintain_index: the orchestrated maintenance pass (VERDICT r10 #4)
-- heal -> GC -> compact -> drift -> recluster as ONE idempotent call,
executed against a LIVE stream_merge_into_ivf_index writer and across
a pause-maintain-resume cycle. SCALE.md argued the concurrency story;
these tests execute it.
"""

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.sources import compact as compact_mod
from rag_vertex_ai_vector_search_spark.sources.compact import (
    compact_parquet,
    table_file_stats,
)
from rag_vertex_ai_vector_search_spark.streaming.ivf_stream import (
    stream_merge_into_ivf_index,
)
from rag_vertex_ai_vector_search_spark.streaming.maintenance import (
    maintain_index,
)

# Slow tier: real streaming lifecycles + rewrites.
pytestmark = pytest.mark.full

SCHEMA = "doc_id long, text string"
DIM = 8


def _centroids(n=2, seed=7):
    return np.random.RandomState(seed).randn(n, DIM)


def _append(spark, rows, src):
    # single-file atomic append (CLAUDE.md streaming-append rule)
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _start_merge(spark, src, index_path, centroids, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    return stream_merge_into_ivf_index(
        stream, index_path, centroids, checkpoint_dir=ckpt, dim=DIM
    )


def _ids(spark, index_path):
    return sorted(
        r.data_point_id
        for r in spark.read.parquet(index_path)
        .select("data_point_id")
        .collect()
    )


def _age_dir(path, seconds_ago):
    old = time.time() - seconds_ago
    for root, dirs, files in os.walk(path):
        for name in [*dirs, *files]:
            os.utime(os.path.join(root, name), (old, old))
    os.utime(path, (old, old))


def test_compact_abort_on_concurrent_commit(spark, tmp_path):
    """abort_if_changed: a commit landing between the read and the
    swap abandons the rewrite -- the late rows survive, the stale
    rewrite does not replace them."""
    base = str(tmp_path / "tbl")
    for i in range(4):  # 4 small files
        spark.range(i * 10, (i + 1) * 10).coalesce(1).write.mode(
            "append"
        ).parquet(base)
    n_before = table_file_stats(spark, base)[0]
    assert n_before >= 4

    real_check = compact_mod._pre_swap_check

    def _commit_then_check(s, p):
        # a "concurrent writer" commits one more file inside the window
        s.range(100, 110).coalesce(1).write.mode("append").parquet(p)
        return real_check(s, p)

    try:
        compact_mod._pre_swap_check = _commit_then_check
        n_after = compact_parquet(
            spark, base, target_file_bytes=1 << 30, abort_if_changed=True
        )
    finally:
        compact_mod._pre_swap_check = real_check

    # no swap: the late commit's rows are present, nothing lost
    assert sorted(r.id for r in spark.read.parquet(base).collect()) == list(
        range(0, 40)
    ) + list(range(100, 110))
    assert n_after == n_before + 1  # the extra file, not the rewrite
    assert not os.path.exists(base + compact_mod.TMP_SUFFIX)
    assert not os.path.exists(base + compact_mod.PENDING_MARKER_SUFFIX)
    # and without interference the same call compacts
    n_final = compact_parquet(
        spark, base, target_file_bytes=1 << 30, abort_if_changed=True
    )
    assert n_final == 1


def test_compact_abort_on_inflight_staging(spark, tmp_path):
    """An UNCOMMITTED in-flight job (staging dir present, nothing in
    the listing yet) must also abort the swap -- its commit would land
    in the renamed-away dir otherwise."""
    base = str(tmp_path / "tbl2")
    for i in range(3):
        spark.range(i * 5, (i + 1) * 5).coalesce(1).write.mode(
            "append"
        ).parquet(base)
    os.makedirs(os.path.join(base, "_temporary", "0"))
    n_before = table_file_stats(spark, base)[0]
    n_after = compact_parquet(
        spark, base, target_file_bytes=1 << 30, abort_if_changed=True
    )
    assert n_after == n_before  # swap abandoned
    assert os.path.isdir(os.path.join(base, "_temporary", "0"))
    # writers paused (flag off): compaction proceeds as before
    os.rmdir(os.path.join(base, "_temporary", "0"))
    os.rmdir(os.path.join(base, "_temporary"))
    assert compact_parquet(spark, base, target_file_bytes=1 << 30) == 1


def test_maintain_index_live_writer(spark, tmp_path):
    """The full pass against a LIVE ingest stream: aged crash remnants
    are GC'd, the live writer's fresh staging dir is age-gate
    protected, the recluster is deferred, and across racing appends no
    row is lost or duplicated."""
    src = str(tmp_path / "incoming")
    index_path = str(tmp_path / "ivf")
    ckpt = str(tmp_path / "ckpt")
    cents = _centroids()

    _append(spark, [(i, f"doc {i}") for i in range(20)], src)
    q = _start_merge(spark, src, index_path, cents, ckpt)
    try:
        q.processAllAvailable()
        _append(spark, [(i, f"doc {i}") for i in range(20, 40)], src)
        q.processAllAvailable()

        # plant: an AGED crashed-job remnant (GC must remove) and a
        # FRESH staging dir standing in for the live writer's next
        # in-flight attempt (GC must leave alone).
        aged = os.path.join(index_path, ".spark-staging-deadjob")
        os.makedirs(aged)
        with open(os.path.join(aged, "part-000"), "w") as fh:
            fh.write("remnant")
        _age_dir(aged, seconds_ago=48 * 3600)
        fresh = os.path.join(index_path, ".spark-staging-livejob")
        os.makedirs(fresh)
        with open(os.path.join(fresh, "part-000"), "w") as fh:
            fh.write("inflight")

        # race a third batch against the maintenance pass: append
        # WITHOUT draining first, then maintain while the trigger may
        # be mid-flight.
        _append(spark, [(i, f"doc {i}") for i in range(40, 60)], src)
        report = maintain_index(
            spark,
            index_path,
            cents,
            writer_active=True,
            min_age_seconds=24 * 3600,
            max_leaf_rows=5,  # guaranteed flagged -> must be DEFERRED
        )
        q.processAllAvailable()
    finally:
        q.stop()

    assert report["gc"]["deleted_dirs"] == 1  # the aged remnant
    assert not os.path.exists(aged)
    assert os.path.isdir(fresh)  # age gate protected the live writer
    if report["recluster_needed"]:
        assert report["recluster_deferred"] and not report["recluster_ran"]
    assert report["centroids"] is cents  # unchanged in live mode

    # no loss, no duplication across all three batches + the race
    assert _ids(spark, index_path) != []
    final = spark.read.parquet(index_path)
    assert final.count() == 60
    assert final.select("data_point_id").distinct().count() == 60


def test_maintain_index_pause_maintain_resume(spark, tmp_path):
    """The orchestrated nightly loop: stop the stream at a batch
    boundary, run the FULL pass (compact + recluster), resume from the
    same checkpoint with the grown centroid matrix -- rows identical
    around the maintenance, stream continues losslessly."""
    src = str(tmp_path / "incoming")
    index_path = str(tmp_path / "ivf")
    ckpt = str(tmp_path / "ckpt")
    cents = _centroids()

    _append(spark, [(i, f"doc {i}") for i in range(25)], src)
    q = _start_merge(spark, src, index_path, cents, ckpt)
    try:
        q.processAllAvailable()
        _append(spark, [(i, f"doc {i}") for i in range(25, 50)], src)
        q.processAllAvailable()
    finally:
        q.stop()

    ids_before = _ids(spark, index_path)
    files_before = table_file_stats(spark, index_path)[0]
    report = maintain_index(
        spark,
        index_path,
        cents,
        writer_active=False,
        min_age_seconds=0,  # writers stopped: GC may sweep everything
        max_leaf_rows=10,
        recluster_kwargs={"per_leaf_sample": 1000, "seed": 3},
    )
    assert report["recluster_needed"] and report["recluster_ran"]
    new_cents = report["centroids"]
    assert new_cents.shape[0] > cents.shape[0]  # leaves split
    assert report["files_after"] <= files_before
    # the maintenance pass moved rows between leaves, never changed them
    assert _ids(spark, index_path) == ids_before
    maxleaf = (
        spark.read.parquet(index_path)
        .groupBy("cluster_id")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert maxleaf <= 10

    # resume the SAME checkpoint with the grown matrix; stream on
    q = _start_merge(spark, src, index_path, new_cents, ckpt)
    try:
        _append(spark, [(i, f"doc {i}") for i in range(50, 60)], src)
        q.processAllAvailable()
    finally:
        q.stop()
    final = spark.read.parquet(index_path)
    assert final.count() == 60
    assert final.select("data_point_id").distinct().count() == 60
    assert (
        final.agg(F.max("cluster_id")).first()[0] < new_cents.shape[0]
    )

    # convergence: the documented maintenance loop (recluster defers /
    # re-splits over invocations) reaches a healthy table in a few
    # passes, each one row-preserving; the healthy pass does nothing.
    ids_now = _ids(spark, index_path)
    for _ in range(5):
        report2 = maintain_index(
            spark,
            index_path,
            new_cents,
            writer_active=False,
            min_age_seconds=0,
            max_leaf_rows=10,
        )
        new_cents = report2["centroids"]
        assert report2["gc"]["deleted_dirs"] == 0
        assert _ids(spark, index_path) == ids_now
        if not report2["recluster_needed"]:
            break
    else:
        pytest.fail("maintenance loop did not converge in 5 passes")
    assert not report2["recluster_ran"]  # the healthy pass is a no-op


_WRITER_SCRIPT = r"""
import sys, time
from pyspark.sql import SparkSession

path, n_batches, rows_per = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .appName("second-writer")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
for b in range(n_batches):
    rows = [
        (f"w{b}_{i}", [float(b % 7), float(i % 5)] + [0.0] * 6, int(b % 2))
        for i in range(rows_per)
    ]
    spark.createDataFrame(
        rows,
        "data_point_id string, feature_vector array<double>, "
        "cluster_id int",
    ).coalesce(1).write.mode("append").partitionBy(
        "cluster_id"
    ).parquet(path)
    time.sleep(0.05)
print("WRITER_DONE")
spark.stop()
"""


def test_maintain_index_second_session_writer(spark, tmp_path):
    """The two-session contract (VERDICT r12 #7): a SECOND SparkSession
    in its own JVM appends batches to the index path while this
    session's maintain_index loops writer_active=True. Across every
    interleaving -- optimistic aborts, landed compactions, the
    late-commit rescue -- zero rows lost, zero duplicated. The
    in-process live-writer test simulates one racing append; this one
    runs a real foreign writer the listing snapshot cannot coordinate
    with."""
    import subprocess
    import sys as _sys

    index_path = str(tmp_path / "ivf")
    cents = _centroids()
    seed_rows = [
        (f"s{i}", [float(i % 7), float(i % 5)] + [0.0] * 6, i % 2)
        for i in range(40)
    ]
    # the table's layout CONTRACT is partitionBy(cluster_id) -- both
    # sessions write it; maintain_index's compaction preserves it (a
    # root-level append into a partitioned table is invisible to
    # partition discovery, a layout violation rather than a race)
    spark.createDataFrame(
        seed_rows,
        "data_point_id string, feature_vector array<double>, "
        "cluster_id int",
    ).repartition(8).write.partitionBy("cluster_id").parquet(index_path)

    script = str(tmp_path / "writer.py")
    with open(script, "w") as fh:
        fh.write(_WRITER_SCRIPT)
    n_batches, rows_per = 24, 5
    proc = subprocess.Popen(
        [_sys.executable, script, index_path, str(n_batches),
         str(rows_per)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    reports = []
    try:
        deadline = time.time() + 180
        while proc.poll() is None and time.time() < deadline:
            reports.append(
                maintain_index(
                    spark, index_path, cents,
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
    # one final pass with the writer gone: heals anything pending
    reports.append(
        maintain_index(
            spark, index_path, cents, writer_active=False,
            min_age_seconds=24 * 3600, target_file_bytes=1 << 20,
        )
    )
    assert len(reports) >= 2  # maintenance genuinely overlapped writes

    spark.catalog.refreshByPath(index_path)  # drop any stale listing
    final = spark.read.parquet(index_path)
    ids = sorted(r.data_point_id for r in final.collect())
    want = sorted(
        [f"s{i}" for i in range(40)]
        + [f"w{b}_{i}" for b in range(n_batches) for i in range(rows_per)]
    )
    assert ids == want  # zero lost, zero duplicated, both sessions
