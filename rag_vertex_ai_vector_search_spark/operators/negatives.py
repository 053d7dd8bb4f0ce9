"""Hard-negative mining for retrieval-model training (the DPR/ANCE
recipe, Karpukhin et al. 2020 / Xiong et al. 2021): for every training
query, the best negatives are the top-scoring corpus items that are
NOT labeled positive -- near-misses teach the encoder far more than
random negatives.

Composition, not new machinery: score with the engine's own search
stack (``knn_search`` -- fold / GEMM / cogroup / any future strategy),
remove labeled positives with an anti-join, re-rank the survivors,
keep ``n_negatives``. Because the scorer IS the search surface, the
mined negatives automatically reflect whatever metric and index the
retrieval system actually serves (ANCE's point: mine from the CURRENT
index, refreshed as training progresses -- re-run this operator per
refresh).

Scale shape: one kNN pass over-fetches ``k_fetch`` candidates per
query (top-k-sized output), positives broadcast into the anti-join
(labels are training-set-sized, tiny next to the corpus), and the
re-rank window runs on <= k_fetch rows per query. No new shuffle
class beyond the search itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .knn import knn_search


def mine_hard_negatives(
    index_df: DataFrame,
    queries_df: DataFrame,
    positives_df: DataFrame,
    *,
    n_negatives: int = 5,
    k_fetch: int | None = None,
    pos_id_col: str = "pos_id",
    **search_kwargs,
) -> DataFrame:
    """(query_id, neg_rank, neighbor_id, score): the ``n_negatives``
    highest-scoring non-positive corpus items per query.

    ``positives_df``: (query_id, pos_id) labeled relevance pairs.
    ``k_fetch`` over-fetches candidates before the anti-join (default
    ``n_negatives + max positives per query`` is unknowable cheaply,
    so 4x n_negatives; raise it if queries can have many positives).
    Extra ``search_kwargs`` flow to ``knn_search`` (method, restrict,
    metric wrappers compose outside).
    """
    fetch = k_fetch or 4 * n_negatives
    hits = knn_search(index_df, queries_df, fetch, **search_kwargs)
    pos = positives_df.select(
        F.col("query_id"), F.col(pos_id_col).alias("neighbor_id")
    )
    nonpos = hits.join(F.broadcast(pos), ["query_id", "neighbor_id"],
                       "left_anti")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        nonpos.withColumn("neg_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("neg_rank") <= n_negatives)
        .select("query_id", "neg_rank", "neighbor_id", "score")
    )
