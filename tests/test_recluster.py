"""recluster_ivf_index: the tree-AH rebalance (STREAM_UPDATE index,
reference index_manager.py:53; leaf cap common/config.py:37).

Pins the docstring's contract: (a) full-probe search results identical
pre/post (row set preserved, only the partition map refines), (b)
low-probe recall restored on a drifted fixture, (c) healthy partitions
byte-identical -- only touched dirs rewritten, (d) zero duplicate ids
after a recluster that empties a flagged (bucket, leaf) dir, (e) a
crash between the overwrite commit and the stale-dir cleanup is
repairable on re-run via the _recluster_pending.json marker, (f) the
driver-side training sample is bounded by max_sample_rows with
worst-first leaf selection, (g) _index_manifest.json n_clusters tracks
the grown centroid count.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.ivf import IVFIndex, ivf_search
from rag_vertex_ai_vector_search_spark.streaming import ivf_stream
from rag_vertex_ai_vector_search_spark.streaming.ivf_stream import (
    RECLUSTER_PENDING_FILE,
    _resume_pending_cleanup,
    cluster_drift_report,
    needs_recluster,
    recluster_ivf_index,
)

DIM = 4
N_BUCKETS = 8


def _vec(base, i, eps=0.01):
    # unique per (base, i): strictly distinct vectors -> no score ties
    v = [float(b) + eps * (i + 1) * (d + 1) for d, b in enumerate(base)]
    return v + [0.0] * (DIM - len(v))


def _write_index(spark, path, rows, with_bucket=True):
    """rows: list of (data_point_id, feature_vector, cluster_id)."""
    df = spark.createDataFrame(
        rows, "data_point_id string, feature_vector array<double>, cluster_id int"
    )
    parts = ["cluster_id"]
    if with_bucket:
        df = df.withColumn(
            "_bucket",
            F.pmod(F.xxhash64(F.col("data_point_id")), F.lit(N_BUCKETS)).cast(
                "int"
            ),
        )
        parts = ["_bucket", "cluster_id"]
    df.write.mode("overwrite").partitionBy(*parts).parquet(path)
    return path


def _full_probe(spark, path, centroids, qvecs, k):
    index = IVFIndex(
        assigned=spark.read.parquet(path),
        centroids=np.ascontiguousarray(centroids, dtype=np.float64),
        id_col="data_point_id",
        vec_col="feature_vector",
    )
    queries = spark.createDataFrame(
        [(f"q{i}", v) for i, v in enumerate(qvecs)],
        "query_id string, query_vector array<double>",
    )
    return {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_search(
            index, queries, k, probe_percent=100.0, method="fold"
        ).collect()
    }


def _dir_snapshot(path):
    """(relpath -> (size, mtime_ns)) for every data file under path."""
    snap = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            full = os.path.join(root, f)
            st = os.stat(full)
            snap[os.path.relpath(full, path)] = (st.st_size, st.st_mtime_ns)
    return snap


def _ids(spark, path):
    return sorted(
        r[0] for r in spark.read.parquet(path).select("data_point_id").collect()
    )


@pytest.mark.full
def test_split_preserves_rows_and_full_probe_results(spark, tmp_path):
    """Oversized leaf splits; full-probe search identical pre/post;
    healthy leaf dirs byte-identical."""
    centroids = np.array([_vec([0.0, 0.0], 0, 0), _vec([10.0, 10.0], 0, 0)])
    rows = [(f"h{i}", _vec([0.0, 0.0], i), 0) for i in range(20)]
    # leaf 1 oversized: two clumps, 30 rows each
    rows += [(f"a{i}", _vec([10.0, 10.0], i), 1) for i in range(30)]
    rows += [(f"b{i}", _vec([20.0, 20.0], i), 1) for i in range(30)]
    path = _write_index(spark, str(tmp_path / "idx"), rows)

    qvecs = [_vec([0.0, 0.0], 0, 0), _vec([10.0, 10.0], 0, 0),
             _vec([20.0, 20.0], 0, 0)]
    before = _full_probe(spark, path, centroids, qvecs, k=5)
    healthy_before = {
        k: v for k, v in _dir_snapshot(path).items() if "cluster_id=0" in k
    }

    new_cent = recluster_ivf_index(
        spark, path, centroids, max_leaf_rows=50, max_drift_fraction=1.1
    )
    assert new_cent.shape[0] > centroids.shape[0]

    # Row set preserved, zero duplicate ids.
    got = _ids(spark, path)
    assert got == sorted(r[0] for r in rows)

    # Full-probe search identical (only the partition map refined).
    after = _full_probe(spark, path, new_cent, qvecs, k=5)
    assert after == before

    # Healthy leaf untouched: byte-identical files.
    healthy_after = {
        k: v for k, v in _dir_snapshot(path).items() if "cluster_id=0" in k
    }
    assert healthy_after == healthy_before

    # The split leaf's rows sit under the refined partition map and no
    # leaf exceeds the cap any more.
    final = spark.read.parquet(path)
    sizes = {
        r.cluster_id: r.n
        for r in final.groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    }
    assert max(sizes.values()) <= 50


@pytest.mark.full
def test_drifted_leaf_recall_restored_at_low_probe(spark, tmp_path):
    """Sticky assignment left half of leaf 0's rows far from its
    centroid; nprobe=1 search misses them until recluster plants a
    sub-centroid where the rows actually are."""
    centroids = np.array([_vec([0.0, 0.0], 0, 0), _vec([100.0, 100.0], 0, 0)])
    rows = [(f"n{i}", _vec([0.0, 0.0], i), 0) for i in range(15)]
    rows += [(f"d{i}", _vec([60.0, 60.0], i), 0) for i in range(15)]  # drifted
    rows += [(f"f{i}", _vec([100.0, 100.0], i), 1) for i in range(15)]
    path = _write_index(spark, str(tmp_path / "idx"), rows)

    report = cluster_drift_report(spark.read.parquet(path), centroids)
    assert needs_recluster(report, max_leaf_rows=500, max_drift_fraction=0.2)

    def _recall_at_1probe(cent):
        index = IVFIndex(
            assigned=spark.read.parquet(path),
            centroids=np.ascontiguousarray(cent, dtype=np.float64),
            id_col="data_point_id",
            vec_col="feature_vector",
        )
        queries = spark.createDataFrame(
            [("q0", _vec([60.0, 60.0], 0, 0))],
            "query_id string, query_vector array<double>",
        )
        hits = ivf_search(index, queries, 10, nprobe=1, method="fold").collect()
        return sum(1 for r in hits if r.neighbor_id.startswith("d")) / 10.0

    assert _recall_at_1probe(centroids) == 0.0  # query probes leaf 1
    new_cent = recluster_ivf_index(
        spark, path, centroids, max_leaf_rows=500, max_drift_fraction=0.2
    )
    assert new_cent.shape[0] > centroids.shape[0]
    assert _recall_at_1probe(new_cent) == 1.0
    # row set unchanged by the rebalance
    assert len(_ids(spark, path)) == len(rows)


def test_noop_when_no_leaf_flagged(spark, tmp_path):
    centroids = np.array([_vec([0.0, 0.0], 0, 0), _vec([10.0, 10.0], 0, 0)])
    rows = [(f"h{i}", _vec([0.0, 0.0], i), 0) for i in range(5)]
    rows += [(f"g{i}", _vec([10.0, 10.0], i), 1) for i in range(5)]
    path = _write_index(spark, str(tmp_path / "idx"), rows)
    before = _dir_snapshot(path)
    out = recluster_ivf_index(
        spark, path, centroids, max_leaf_rows=50, max_drift_fraction=0.5
    )
    assert np.array_equal(out, centroids)
    assert _dir_snapshot(path) == before
    assert not os.path.exists(os.path.join(path, RECLUSTER_PENDING_FILE))


def _two_bucket_fixture(spark, tmp_path):
    """A flagged 2-row leaf whose rows hash to DIFFERENT buckets: after
    the k=2 split one row keeps the leaf id (sub-centroid 0 replaces it
    in place) and the other moves to a new id, so exactly one old
    (bucket, leaf) pair is left stale and must be deleted."""
    cand = spark.createDataFrame(
        [(f"c{i}",) for i in range(40)], "data_point_id string"
    ).withColumn(
        "_bucket",
        F.pmod(F.xxhash64(F.col("data_point_id")), F.lit(N_BUCKETS)).cast("int"),
    )
    by_bucket = {}
    for r in cand.collect():
        by_bucket.setdefault(r._bucket, r.data_point_id)
    (b1, id1), (b2, id2) = sorted(by_bucket.items())[:2]
    assert b1 != b2
    centroids = np.array([_vec([0.0, 0.0], 0, 0), _vec([50.0, 50.0], 0, 0)])
    rows = [
        (id1, _vec([0.0, 0.0], 0, 0), 0),
        (id2, _vec([50.0, 50.0], 0, 0), 0),  # far clump, same leaf
        ("other", _vec([50.0, 50.0], 1), 1),
    ]
    path = _write_index(spark, str(tmp_path / "idx"), rows)
    return path, centroids, rows


def test_emptied_pair_dir_deleted_no_duplicate_ids(spark, tmp_path):
    path, centroids, rows = _two_bucket_fixture(spark, tmp_path)
    old_dirs = {
        d for d in _dir_snapshot(path) if "cluster_id=0" in d
    }
    recluster_ivf_index(
        spark, path, centroids, max_leaf_rows=1, max_drift_fraction=1.1
    )
    # exactly-once ids, full row set
    assert _ids(spark, path) == sorted(r[0] for r in rows)
    # at least one old (bucket, leaf-0) pair dir is gone (the split
    # moved its only row to a new leaf id)
    remaining = set(_dir_snapshot(path))
    assert any(
        not any(r.startswith(os.path.dirname(d)) for r in remaining)
        for d in old_dirs
    )
    assert not os.path.exists(os.path.join(path, RECLUSTER_PENDING_FILE))


def test_crash_between_overwrite_and_cleanup_is_repairable(
    spark, tmp_path, monkeypatch
):
    path, centroids, rows = _two_bucket_fixture(spark, tmp_path)

    def _boom(*a, **k):
        raise RuntimeError("simulated crash before stale-dir cleanup")

    monkeypatch.setattr(ivf_stream, "_delete_index_subdirs", _boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        recluster_ivf_index(
            spark, path, centroids, max_leaf_rows=1, max_drift_fraction=1.1
        )
    monkeypatch.undo()

    # The hazard is real: the stale pair dir duplicates its row.
    ids_dup = _ids(spark, path)
    assert len(ids_dup) > len(set(ids_dup))
    assert os.path.exists(os.path.join(path, RECLUSTER_PENDING_FILE))

    # Re-running recluster repairs on entry, then proceeds normally.
    recluster_ivf_index(
        spark, path, centroids, max_leaf_rows=1, max_drift_fraction=1.1
    )
    assert _ids(spark, path) == sorted(r[0] for r in rows)
    assert not os.path.exists(os.path.join(path, RECLUSTER_PENDING_FILE))


def test_resume_cleanup_keeps_rows_when_overwrite_never_committed(
    spark, tmp_path
):
    """A marker whose witness files are still in place means the
    overwrite never committed: the pending dirs are the only copy of
    their rows and must survive; only the marker is dropped."""
    centroids = np.array([_vec([0.0, 0.0], 0, 0), _vec([9.0, 9.0], 0, 0)])
    rows = [(f"h{i}", _vec([0.0, 0.0], i), 0) for i in range(4)]
    rows += [(f"g{i}", _vec([9.0, 9.0], i), 1) for i in range(4)]
    path = _write_index(spark, str(tmp_path / "idx"), rows)
    snap = _dir_snapshot(path)
    victim = sorted(d for d in snap if "cluster_id=0" in d)[0]
    victim_dir = os.path.dirname(victim)
    witness = sorted(d for d in snap if "cluster_id=1" in d)[0]

    from rag_vertex_ai_vector_search_spark.operators.upsert import (
        write_json_sidecar,
    )

    write_json_sidecar(
        spark, path, RECLUSTER_PENDING_FILE,
        {
            "pending_delete": [victim_dir],
            "witness_dir": os.path.dirname(witness),
            "witness_old_files": [os.path.basename(witness)],
        },
    )
    _resume_pending_cleanup(spark, path)
    assert _dir_snapshot(path) == snap  # nothing deleted
    assert not os.path.exists(os.path.join(path, RECLUSTER_PENDING_FILE))
    assert _ids(spark, path) == sorted(r[0] for r in rows)


@pytest.mark.full
def test_driver_sample_budget_defers_leaves_and_converges(spark, tmp_path):
    """max_sample_rows bounds the per-invocation driver collect; worst
    leaves go first and deferred leaves stay flagged until a later
    invocation -- the maintenance loop converges with flat memory."""
    centroids = np.array([
        _vec([0.0, 0.0], 0, 0), _vec([30.0, 30.0], 0, 0),
        _vec([60.0, 60.0], 0, 0),
    ])
    rows = []
    # leaf 0: worst (40 rows, two clumps); leaf 1: 30 rows, two clumps;
    # leaf 2 healthy.
    for i in range(20):
        rows.append((f"a{i}", _vec([0.0, 0.0], i), 0))
        rows.append((f"b{i}", _vec([10.0, 10.0], i), 0))
    for i in range(15):
        rows.append((f"c{i}", _vec([30.0, 30.0], i), 1))
        rows.append((f"d{i}", _vec([40.0, 40.0], i), 1))
    for i in range(10):
        rows.append((f"e{i}", _vec([60.0, 60.0], i), 2))
    path = _write_index(spark, str(tmp_path / "idx"), rows)

    # Budget fits only the worst leaf's sample (40 rows): leaf 1 must
    # be deferred this invocation.
    cent1 = recluster_ivf_index(
        spark, path, centroids, max_leaf_rows=25, max_drift_fraction=1.1,
        max_sample_rows=40,
    )
    sizes = {
        r.cluster_id: r.n
        for r in spark.read.parquet(path)
        .groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    }
    assert sizes[1] == 30  # deferred, untouched
    report = cluster_drift_report(spark.read.parquet(path), cent1)
    assert needs_recluster(report, max_leaf_rows=25, max_drift_fraction=1.1)

    # Next invocation picks up the deferred leaf; loop converges.
    cent2 = cent1
    for _ in range(4):
        report = cluster_drift_report(spark.read.parquet(path), cent2)
        if not needs_recluster(
            report, max_leaf_rows=25, max_drift_fraction=1.1
        ):
            break
        cent2 = recluster_ivf_index(
            spark, path, cent2, max_leaf_rows=25, max_drift_fraction=1.1,
            max_sample_rows=40,
        )
    final = {
        r.cluster_id: r.n
        for r in spark.read.parquet(path)
        .groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    }
    assert max(final.values()) <= 25
    assert _ids(spark, path) == sorted(r[0] for r in rows)


@pytest.mark.full
def test_budget_is_strict_worst_first_prefix(spark, tmp_path):
    """r11 (ADVICE): once a leaf's need exceeds the remaining budget,
    it AND every less-severe leaf defer -- a small low-severity leaf
    never jumps a big hot one (the docstring's 'worst leaves first'
    is a strict prefix, not first-fit packing)."""
    centroids = np.array([
        _vec([0.0, 0.0], 0, 0), _vec([30.0, 30.0], 0, 0),
        _vec([60.0, 60.0], 0, 0),
    ])
    rows = []
    # severities (max_leaf_rows=25): leaf0 40/25, leaf1 35/25, leaf2
    # 30/25. Budget 70: leaf0 takes 40; leaf1 needs 35 > 30 remaining
    # -> deferred; leaf2 (30 <= 30) WOULD fit but must defer too.
    for i in range(20):
        rows.append((f"a{i}", _vec([0.0, 0.0], i), 0))
        rows.append((f"b{i}", _vec([10.0, 10.0], i), 0))
    for i in range(35):
        rows.append((f"c{i}", _vec([30.0 + (i % 2) * 10.0, 30.0], i), 1))
    for i in range(30):
        rows.append((f"e{i}", _vec([60.0 + (i % 2) * 10.0, 60.0], i), 2))
    path = _write_index(spark, str(tmp_path / "idx"), rows)

    recluster_ivf_index(
        spark, path, centroids, max_leaf_rows=25, max_drift_fraction=1.1,
        max_sample_rows=70,
    )
    sizes = {
        r.cluster_id: r.n
        for r in spark.read.parquet(path)
        .groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    }
    assert sizes.get(1) == 35  # over-budget leaf deferred
    assert sizes.get(2) == 30  # less-severe leaf deferred WITH it
    assert sizes.get(0, 0) < 40  # the worst leaf was split
    assert _ids(spark, path) == sorted(r[0] for r in rows)


def test_manifest_n_clusters_updated(spark, tmp_path):
    from rag_vertex_ai_vector_search_spark.plans.manifest import (
        IndexManifest,
        load_manifest,
        save_manifest,
    )

    centroids = np.array([_vec([0.0, 0.0], 0, 0), _vec([10.0, 10.0], 0, 0)])
    rows = [(f"a{i}", _vec([10.0, 10.0], i), 1) for i in range(20)]
    rows += [(f"b{i}", _vec([20.0, 20.0], i), 1) for i in range(20)]
    rows += [(f"h{i}", _vec([0.0, 0.0], i), 0) for i in range(5)]
    path = _write_index(spark, str(tmp_path / "idx"), rows)
    save_manifest(IndexManifest(dimensions=DIM, n_clusters=2), path)

    new_cent = recluster_ivf_index(
        spark, path, centroids, max_leaf_rows=25, max_drift_fraction=1.1
    )
    man = load_manifest(path)
    assert man.n_clusters == new_cent.shape[0] > 2
    assert man.extra["last_recluster"]["n_clusters_before"] == 2
    assert 1 in man.extra["last_recluster"]["flagged_leaves"]
