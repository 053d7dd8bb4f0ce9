"""IVF (inverted-file) approximate search: the tree-AH analog.

The reference's index is tree-AH with leaf_node_embedding_count=500 and
leaf_nodes_to_search_percent=10 (common/config.py:36-38): vectors live
in leaves, a query visits ~10% of leaves. The Spark-native equivalent
is a DATA LAYOUT, not an engine extension:

- build: MLlib KMeans assigns every vector a ``cluster_id``; the index
  table is written ``partitionBy("cluster_id")`` so each cluster is a
  parquet partition (== a leaf).
- search: score the query against the (tiny, driver-held) centroid
  matrix, take the top ``nprobe`` clusters, and push
  ``cluster_id IN (...)`` into the scan -- partition pruning means the
  10% of leaves actually read is 10% of bytes, not 10% of rows after a
  full scan. Then the exact kNN operator runs on the survivors.

recall@k vs the exact path is the quality gate (>= 0.95 on fixtures,
mirroring leaf_nodes_to_search_percent semantics) --
tests/test_ivf.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .knn import knn_search


@dataclass
class IVFIndex:
    """Clustered layout + centroid matrix (the index 'manifest')."""

    assigned: DataFrame          # input columns + cluster_id
    centroids: np.ndarray        # (n_clusters, dim) float64
    id_col: str
    vec_col: str

    def save(self, path: str) -> None:
        self.assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(path)


def build_ivf_index(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    seed: int = 42,
    max_iter: int = 20,
    max_train_rows: int = 200_000,
) -> IVFIndex:
    """KMeans-cluster the corpus into ``n_clusters`` leaves.

    Sizing rule at scale: n_clusters ~ n_rows / leaf_node_embedding_count
    (500 in the reference) and never below sqrt(n_rows); centroids stay
    driver-side (n_clusters x dim doubles -- tiny even at 1e5 clusters).

    Training runs on a bounded SAMPLE (``max_train_rows``): k-means
    centroid quality converges long before the full corpus is seen, so
    at 100 TB the iterative phase touches ~1e5 rows while the single
    assignment pass (transform) streams everything once.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn("_features", array_to_vector(F.col(vec_col)))
    train = feat
    n_rows = feat.count()
    if n_rows > max_train_rows:
        train = feat.sample(
            fraction=min(1.0, max_train_rows / n_rows), seed=seed
        )
    model = KMeans(
        k=n_clusters, seed=seed, maxIter=max_iter, featuresCol="_features",
        predictionCol="cluster_id",
    ).fit(train)
    assigned = model.transform(feat).drop("_features")
    centroids = np.asarray(model.clusterCenters(), dtype=np.float64)
    return IVFIndex(assigned=assigned, centroids=centroids, id_col=id_col, vec_col=vec_col)


def ivf_search(
    index: IVFIndex,
    queries_df: DataFrame,
    k: int,
    *,
    nprobe: int | None = None,
    probe_percent: float = 10.0,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vector",
    method: str = "gemm",
    **knn_kwargs,
) -> DataFrame:
    """Pruned top-k: probe the best ``nprobe`` clusters per query.

    ``probe_percent`` defaults to the reference's
    leaf_nodes_to_search_percent=10 (common/config.py:38).
    """
    n_clusters = index.centroids.shape[0]
    if nprobe is None:
        nprobe = max(1, int(round(n_clusters * probe_percent / 100.0)))

    rows = queries_df.select(query_id_col, query_vec_col).collect()
    if not rows:
        return knn_search(
            index.assigned.limit(0), queries_df, k,
            id_col=index.id_col, vec_col=index.vec_col,
            query_id_col=query_id_col, query_vec_col=query_vec_col,
            method="fold", **knn_kwargs,
        )

    spark = queries_df.sparkSession
    qmat = np.asarray([r[1] for r in rows], dtype=np.float64)
    # Nearest centroids by euclidean distance (KMeans geometry); for
    # unit-norm vectors the dot-product ranking matches.
    d2 = (
        (qmat ** 2).sum(axis=1, keepdims=True)
        - 2.0 * qmat @ index.centroids.T
        + (index.centroids ** 2).sum(axis=1)
    )
    probe_lists = np.argsort(d2, axis=1)[:, :nprobe]

    # Restrict the scan to the union of probed clusters -- partition
    # pruning on the saved layout means pruned leaves are pruned BYTES.
    all_probed = sorted({int(c) for lst in probe_lists for c in lst})
    candidates = index.assigned.filter(F.col("cluster_id").isin(all_probed))

    if method == "gemm":
        return _gemm_masked_topk(
            candidates, rows, probe_lists, n_clusters, k,
            id_col=index.id_col, vec_col=index.vec_col,
            qid_type=queries_df.schema[query_id_col].dataType,
        )

    # Declarative fallback: per-pair probe filter + fold scoring.
    probes = spark.createDataFrame(
        [
            (rows[i][0], [int(c) for c in probe_lists[i]])
            for i in range(len(rows))
        ],
        f"{query_id_col} {queries_df.schema[query_id_col].dataType.simpleString()},"
        " _probe array<int>",
    )
    pruned_queries = queries_df.join(probes, query_id_col)
    q = pruned_queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("_qvec"),
        F.col("_probe"),
    )
    from .knn import _ranked
    from ..functions.vector import dot_product

    scored = (
        candidates.crossJoin(F.broadcast(q))
        .filter(F.array_contains(F.col("_probe"), F.col("cluster_id")))
        .select(
            "query_id",
            F.col(index.id_col).alias("neighbor_id"),
            dot_product(F.col("_qvec"), F.col(index.vec_col)).alias("score"),
        )
    )
    return _ranked(scored, k, None, None).select(
        "query_id", "rank", "neighbor_id", "score"
    )


def _gemm_masked_topk(
    candidates: DataFrame,
    rows,
    probe_lists: np.ndarray,
    n_clusters: int,
    k: int,
    *,
    id_col: str,
    vec_col: str,
    qid_type,
) -> DataFrame:
    """One BLAS GEMM per Arrow batch + per-query probe MASK, then exact
    local top-k; global window finishes. Each query only keeps scores
    from ITS probed clusters, so multi-query batches share the GEMM
    without over-scanning."""
    from pyspark.sql import types as T

    qids = [r[0] for r in rows]
    qmat = np.asarray([r[1] for r in rows], dtype=np.float64)
    probe_mask = np.zeros((len(qids), n_clusters), dtype=bool)  # (nq, nc)
    for i, lst in enumerate(probe_lists):
        probe_mask[i, lst] = True

    out_schema = T.StructType([
        T.StructField("query_id", qid_type),
        T.StructField("neighbor_id", candidates.schema[id_col].dataType),
        T.StructField("score", T.DoubleType()),
    ])

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            vmat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            clusters = pdf["cluster_id"].to_numpy()
            ids = pdf[id_col].to_numpy()
            scores = qmat @ vmat.T  # (nq, nv)
            allowed = probe_mask[:, clusters]  # (nq, nv)
            scores = np.where(allowed, scores, -np.inf)
            frames = []
            nv = scores.shape[1]
            for qi in range(len(qids)):
                s = scores[qi]
                valid = s > -np.inf
                if not valid.any():
                    continue
                top = min(k, int(valid.sum()))
                threshold = np.partition(s, nv - top)[nv - top]
                cand = np.nonzero(s >= threshold)[0]
                order = np.lexsort((ids[cand], -s[cand]))[:top]
                idx = cand[order]
                frames.append(pd.DataFrame({
                    "query_id": qids[qi],
                    "neighbor_id": ids[idx],
                    "score": s[idx],
                }))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    from .knn import _ranked

    scored = candidates.select(id_col, vec_col, "cluster_id").mapInPandas(
        score, out_schema
    )
    return _ranked(scored, k, None, None).select(
        "query_id", "rank", "neighbor_id", "score"
    )
