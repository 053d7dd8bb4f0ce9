"""STREAM_UPDATE maintenance of the IVF (tree-AH) layout.

The reference's index is BOTH stream-updatable (index_manager.py:53,
upsert at setup_vector_search.py:147-153) AND leaf-partitioned tree-AH
(common/config.py:36-38). This module keeps the two properties together
under continuous ingest, the way tree-AH stream update actually works:

- **New vectors** are assigned to the nearest EXISTING centroid per
  micro-batch (a pandas UDF holding only the tiny centroid matrix —
  no retraining in the hot path).
- **Updated vectors keep their original leaf** (sticky assignment):
  moving a key between cluster partitions under copy-on-write would
  require rewriting and tombstoning partitions the batch didn't write,
  so reassignment is deferred to the periodic re-cluster — the tree-AH
  rebalance analog. The cost is bounded, measurable recall drift, not
  correctness (search still finds the row via its stored vector).
- **Drift is observable, not silent**: ``cluster_drift_report`` scans
  the index once and reports, per leaf, the row count and the fraction
  of rows whose nearest centroid is no longer their assigned leaf;
  ``needs_recluster`` turns that into the rebuild signal
  (leaf_node_embedding_count economics — oversized or drifted leaves
  are what degrade probe pruning).

The layout partitions by (_bucket, cluster_id): the merge prunes and
rewrites on hash buckets exactly like streaming/ingest.py (O(touched
buckets) per batch, untouched files byte-identical), while probe-time
partition pruning on cluster_id keeps working because sticky keys
never leave their (bucket, cluster) directory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.ingest import ingest_documents
from ..operators.upsert import merge_by_key
from .ingest import DEFAULT_MERGE_BUCKETS, _bucket_expr, _is_path_not_found


def nearest_cluster_udf(centroids: np.ndarray):
    """pandas_udf: vector -> id of its nearest centroid (euclidean, the
    KMeans assignment geometry). Runs on executors; the centroid matrix
    ships in the closure (n_clusters x dim doubles — tiny)."""

    def _assign(vecs: pd.Series) -> pd.Series:
        vmat = np.asarray(list(vecs), dtype=np.float64)
        d2 = (
            (vmat ** 2).sum(axis=1, keepdims=True)
            - 2.0 * vmat @ centroids.T
            + (centroids ** 2).sum(axis=1)
        )
        return pd.Series(d2.argmin(axis=1).astype(np.int32))

    return F.pandas_udf(_assign, T.IntegerType())


def stream_merge_into_ivf_index(
    stream_df: DataFrame,
    index_path: str,
    centroids: np.ndarray,
    *,
    checkpoint_dir: str,
    dim: int = 64,
    id_source_col: str = "doc_id",
    text_col: str = "text",
    trigger_seconds: int | None = None,
    n_buckets: int = DEFAULT_MERGE_BUCKETS,
):
    """Streaming upsert that maintains the clustered IVF layout.

    Same exactly-once contract as stream_merge_into_index (checkpoint +
    keyed idempotent merge); each batch additionally assigns new keys a
    ``cluster_id`` from ``centroids`` and preserves existing keys'
    assignments (sticky — see module docstring).
    """
    assign = nearest_cluster_udf(centroids)

    def _merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        result = ingest_documents(
            batch_df, id_source_col=id_source_col, text_col=text_col, dim=dim
        )
        updates = result.datapoints.withColumn(
            "_bucket", _bucket_expr("data_point_id", n_buckets)
        ).withColumn("cluster_id", assign(F.col("feature_vector")))
        try:
            base = spark.read.parquet(index_path)
        except AnalysisException as e:
            if not _is_path_not_found(e):
                raise
            updates.write.mode("errorifexists").partitionBy(
                "_bucket", "cluster_id"
            ).parquet(index_path)
            return

        touched = sorted(
            r[0] for r in updates.select("_bucket").distinct().collect()
        )
        base_touched = base.filter(F.col("_bucket").isin(touched))
        merged = merge_by_key(base_touched, updates, key="data_point_id")
        # Sticky assignment: a key already in the index keeps its leaf
        # even if its vector changed (no cross-partition moves under
        # copy-on-write); new keys take the nearest-centroid id.
        prior = base_touched.select(
            "data_point_id", F.col("cluster_id").alias("_prior_cluster")
        )
        merged = (
            merged.join(prior, "data_point_id", "left")
            .withColumn(
                "cluster_id",
                F.coalesce(F.col("_prior_cluster"), F.col("cluster_id")),
            )
            .drop("_prior_cluster")
        )
        merged.localCheckpoint(eager=True).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("_bucket", "cluster_id").parquet(index_path)

    writer = stream_df.writeStream.foreachBatch(_merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def cluster_drift_report(
    index_df: DataFrame,
    centroids: np.ndarray,
    *,
    vec_col: str = "feature_vector",
) -> DataFrame:
    """Per-leaf health: (cluster_id, n_rows, n_drifted, drift_fraction)
    where a row is drifted if its nearest centroid today is not its
    assigned leaf. One streaming pass, map-side partial aggregation."""
    assign = nearest_cluster_udf(centroids)
    return (
        index_df.withColumn("_nearest", assign(F.col(vec_col)))
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                (F.col("_nearest") != F.col("cluster_id")).cast("long")
            ).alias("n_drifted"),
        )
        .withColumn(
            "drift_fraction", F.col("n_drifted") / F.col("n_rows")
        )
    )


def needs_recluster(
    report_df: DataFrame,
    *,
    max_leaf_rows: int = 500,
    max_drift_fraction: float = 0.2,
) -> bool:
    """The tree-AH rebalance trigger: any leaf over the reference's
    leaf_node_embedding_count (500, common/config.py:37) or past the
    drift tolerance. The report is n_clusters rows — driver-safe."""
    return (
        report_df.filter(
            (F.col("n_rows") > max_leaf_rows)
            | (F.col("drift_fraction") > max_drift_fraction)
        ).limit(1).count()
        > 0
    )
