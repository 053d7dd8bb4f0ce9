"""Streaming maintenance of the IVF layout: nearest-centroid assignment
for new keys, sticky leaves for updated keys, drift observability."""

import numpy as np
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.streaming.ivf_stream import (
    cluster_drift_report,
    needs_recluster,
    stream_merge_into_ivf_index,
)

import pytest

# Slow tier: excluded from the per-commit fast gate (pytest -m "not full");
# the full suite still runs before a round is declared done.
pytestmark = pytest.mark.full


SCHEMA = "doc_id long, text string"


def _run_stream(spark, tmp_path, centroids, batches, dim=8):
    src = str(tmp_path / "incoming")
    index_path = str(tmp_path / "ivf_index")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(batches[0], SCHEMA).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = stream_merge_into_ivf_index(
        stream, index_path, centroids, checkpoint_dir=ckpt, dim=dim
    )
    try:
        q.processAllAvailable()
        for batch in batches[1:]:
            spark.createDataFrame(batch, SCHEMA).write.mode("append").parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()
    return index_path


def test_stream_assigns_nearest_centroid_and_sticky_updates(spark, tmp_path):
    rng = np.random.RandomState(3)
    centroids = rng.randn(4, 8)

    index_path = _run_stream(
        spark, tmp_path, centroids,
        [
            [(i, f"first doc {i}") for i in range(10)],
            # 3 updates (same ids -> same keys) + 2 new
            [(i, f"changed doc {i}") for i in range(3)]
            + [(i, f"new doc {i}") for i in (20, 21)],
        ],
    )
    final = spark.read.parquet(index_path)
    assert final.count() == 12
    assert final.select("data_point_id").distinct().count() == 12

    rows = {r.data_point_id: r for r in final.collect()}
    # Every row's cluster_id is a valid centroid id.
    assert all(0 <= r.cluster_id < 4 for r in rows.values())

    # Updated keys keep their batch-1 leaf (sticky) even though the
    # vector changed: their assignment must match the OLD vector's
    # nearest centroid, not the new one's.
    from rag_vertex_ai_vector_search_spark.operators import ingest_documents

    old = ingest_documents(
        spark.createDataFrame(
            [(i, f"first doc {i}") for i in range(3)], SCHEMA
        ),
        dim=8,
    ).datapoints.collect()
    for r in old:
        v = np.asarray(r.feature_vector, dtype=np.float64)
        expected_leaf = int(((v - centroids) ** 2).sum(axis=1).argmin())
        assert rows[r.data_point_id].cluster_id == expected_leaf


def test_stream_ivf_layout_is_cluster_partitioned(spark, tmp_path):
    """cluster_id is a physical partition column: probe-time pruning on
    the streamed index reads a strict subset of files."""
    import os

    rng = np.random.RandomState(5)
    centroids = rng.randn(4, 8)
    index_path = _run_stream(
        spark, tmp_path, centroids,
        [[(i, f"doc {i}") for i in range(30)]],
    )
    parts = set()
    for root, _dirs, files in os.walk(index_path):
        if any(f.endswith(".parquet") for f in files):
            parts.add(root)
    assert any("cluster_id=" in p for p in parts)

    pruned = spark.read.parquet(index_path).filter(F.col("cluster_id") == 0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "cluster_id" in plan


def test_drift_report_and_recluster_signal(spark, tmp_path):
    rng = np.random.RandomState(7)
    centroids = rng.randn(4, 8)
    index_path = _run_stream(
        spark, tmp_path, centroids,
        [
            [(i, f"first doc {i}") for i in range(20)],
            [(i, f"changed doc {i}") for i in range(20)],  # all updated
        ],
    )
    index = spark.read.parquet(index_path)
    report = cluster_drift_report(index, centroids)
    rep = {r.cluster_id: r for r in report.collect()}
    assert sum(r.n_rows for r in rep.values()) == 20
    # Sticky assignment + changed vectors: drift is measurable (some
    # rows' nearest centroid moved) and the report exposes it.
    assert all(0.0 <= r.drift_fraction <= 1.0 for r in rep.values())

    # Tolerant thresholds -> no signal; tight drift threshold -> signal
    # iff any drift exists; tiny leaf cap -> signal.
    total_drift = sum(r.n_drifted for r in rep.values())
    assert needs_recluster(report, max_leaf_rows=2) is True
    if total_drift > 0:
        assert needs_recluster(
            report, max_leaf_rows=500, max_drift_fraction=0.0
        ) is True
    assert needs_recluster(
        report, max_leaf_rows=500, max_drift_fraction=1.1
    ) is False
