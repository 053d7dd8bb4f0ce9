"""SemDeDup: semantic deduplication by embedding-cluster cosine
pruning (Abbas et al. 2023, arXiv:2303.09540).

The pipeline the paper runs over web-scale corpora: (1) k-means the
embeddings into clusters, (2) within each cluster find pairs above a
cosine threshold ("semantic duplicates" -- same content, different
words, which MinHash cannot see), (3) from each duplicate group keep
exactly ONE representative -- the paper's policy keeps the item with
the LOWEST cosine to its cluster centroid (keep the outlier, drop the
prototypical copies; §3 of the paper measures this beats random/keep-
closest on downstream accuracy).

Composition of this engine's existing verified pieces, not new
machinery: `build_ivf_index` (the k-means layout; accepts the explicit
data-row quantizer that makes the whole pipeline SQL-oracle-able),
`embedding_cosine_pairs[_gemm]` blocked by ``cluster_id`` (quadratic
scans bounded per leaf, never corpus-wide -- the same argument as
embedding_cosine_pairs_ivf), `connected_components` (duplicate groups
from the pair edges), and one window for the keep policy.

Scale shape: pair generation is per-cluster (n_clusters grows with the
corpus, each block ~leaf-sized), components are bounded by actual
duplication, and the keep window partitions by component. Boundary
caveat: like any blocked dedup, a near-dup pair straddling clusters is
missed; the paper accepts this (recall measured against brute force in
test_semdedup.py's small-data gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity
from .cluster import connected_components
from .dedup import embedding_cosine_pairs, embedding_cosine_pairs_gemm
from .ivf import build_ivf_index


def semdedup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.95,
    centroids=None,
    seed: int = 42,
    trainer: str = "numpy",
    pair_method: str = "gemm",
) -> DataFrame:
    """Annotate every row with its SemDeDup verdict:
    ``(id, cluster_id, component_id, component_size, centroid_sim,
    keep)``.

    ``keep`` is True for every non-duplicated row and for exactly one
    representative per duplicate component (lowest ``centroid_sim``,
    id ascending as the deterministic tie-break). Filter on it for the
    pruned corpus; keep the full frame for audit/ablation.

    ``pair_method="gemm"`` (default) scores pairs with the blocked
    BLAS path -- the production choice; ``"fold"`` uses the sequential
    fold expression whose scores mirror bit-exactly in SQL (the
    oracle configuration, with ``centroids`` pinned to data rows).
    """
    index = build_ivf_index(
        df, id_col=id_col, vec_col=vec_col, n_clusters=n_clusters,
        seed=seed, trainer=trainer, centroids=centroids,
    )
    assigned = index.assigned

    spark = df.sparkSession
    cents = spark.createDataFrame(
        [
            (i, [float(x) for x in c])
            for i, c in enumerate(index.centroids)
        ],
        "cluster_id int, _cvec array<double>",
    )
    scored = assigned.withColumn(
        "cluster_id", F.col("cluster_id").cast("int")
    ).join(F.broadcast(cents), "cluster_id").select(
        F.col(id_col),
        "cluster_id",
        F.col(vec_col),
        cosine_similarity(vec_col, "_cvec").alias("centroid_sim"),
    )

    pair_fn = (
        embedding_cosine_pairs_gemm if pair_method == "gemm"
        else embedding_cosine_pairs
    )
    pairs = pair_fn(
        assigned, id_col, vec_col,
        block_col="cluster_id", threshold=threshold,
    )
    comp = connected_components(pairs)

    out = scored.join(
        comp, scored[id_col] == comp["node_id"], "left"
    ).select(
        F.col(id_col),
        "cluster_id",
        F.coalesce(F.col("component_id"), F.col(id_col)).alias(
            "component_id"
        ),
        "centroid_sim",
    )
    w = Window.partitionBy("component_id")
    rank_w = Window.partitionBy("component_id").orderBy(
        F.col("centroid_sim").asc(), F.col(id_col).asc()
    )
    return (
        out.withColumn(
            "component_size", F.count(F.lit(1)).over(w).cast("long")
        )
        .withColumn("_r", F.row_number().over(rank_w))
        .withColumn("keep", F.col("_r") == 1)
        .drop("_r")
        .select(
            id_col, "cluster_id", "component_id", "component_size",
            "centroid_sim", "keep",
        )
    )
