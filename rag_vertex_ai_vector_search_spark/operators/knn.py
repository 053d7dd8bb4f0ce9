"""Top-k nearest-neighbor search: the reference's one real query.

Semantics come from the Vertex FindNeighbors contract the reference's
ingestion configures (SURVEY.md §2.2): restrict pre-filters (Q3/Q4) ->
dot-product scoring (Q2, common/config.py:33) -> per-attribute crowding
(Q5, setup_vector_search.py:65-67) -> top-k (Q1,
approximate_neighbors_count, common/config.py:32) -> metadata hydration
join (Q7, firestore_ops.py:90-107).

Two physical strategies, same results:

- ``method="fold"``: broadcast cross join + a sequential-fold dot
  product Column. Fully declarative; Catalyst pushes the restrict
  filters below the join, and the final limit becomes
  TakeOrderedAndProject. Scores are bit-identical to DuckDB's
  DOUBLE[] list_dot_product, which is what the oracle gate hashes.

- ``method="gemm"``: ``mapInPandas`` over index partitions with the
  (small) query matrix broadcast to every task; one BLAS GEMM per
  Arrow batch, then a *local* top-k per query (and per crowd group
  when crowding is on) before the global window. This is the
  100 TB path: the shuffle after local pruning carries at most
  ``n_queries * k`` rows per partition instead of the full cross
  product, so per-query skew in the window stage is bounded.

Local crowding prune is exact for the two-window crowding semantics:
any row in the global capped top-k is within the top
``per_crowding_k`` of its (query, crowd) group in its own partition,
and below-local-top-k rows can never be promoted globally (each of the
k locally-better capped rows is either selected globally or evicted by
a strictly better same-group row, so >= k better capped rows always
exist globally).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import dot_product

RESULT_COLUMNS = ("query_id", "rank", "neighbor_id", "score")


def _ranked(scored: DataFrame, k: int, per_crowding_k: int | None,
            crowding_col: str | None) -> DataFrame:
    """Apply (optional) crowding cap then top-k; deterministic tie-break."""
    order = [F.col("score").desc(), F.col("neighbor_id").asc()]
    if per_crowding_k is not None and crowding_col is not None:
        crowd_w = Window.partitionBy("query_id", crowding_col).orderBy(*order)
        scored = (
            scored.withColumn("_crowd_rn", F.row_number().over(crowd_w))
            .filter(F.col("_crowd_rn") <= per_crowding_k)
            .drop("_crowd_rn")
        )
    topk_w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(topk_w))
        .filter(F.col("rank") <= k)
    )


def knn_search(
    index_df: DataFrame,
    queries_df: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vector",
    restrict: Column | None = None,
    per_crowding_k: int | None = None,
    crowding_col: str | None = None,
    metadata_df: DataFrame | None = None,
    metadata_key: str = "data_point_id",
    method: str = "fold",
) -> DataFrame:
    """Filtered, diversity-constrained top-k search.

    Returns (query_id, rank, neighbor_id, score[, crowding_col,
    metadata...]). ``restrict`` is applied BEFORE scoring so Catalyst
    can push it to the parquet scan (the reference filters inside the
    ANN traversal for the same reason, setup_vector_search.py:45-62).
    """
    if restrict is not None:
        index_df = index_df.filter(restrict)

    extra_cols = [crowding_col] if crowding_col else []

    if method == "gemm":
        scored = _gemm_score_local_topk(
            index_df, queries_df, k,
            id_col=id_col, vec_col=vec_col,
            query_id_col=query_id_col, query_vec_col=query_vec_col,
            per_crowding_k=per_crowding_k, crowding_col=crowding_col,
        )
    else:
        q = queries_df.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("_qvec"),
        )
        scored = (
            index_df.crossJoin(F.broadcast(q))
            .select(
                "query_id",
                F.col(id_col).alias("neighbor_id"),
                dot_product(F.col("_qvec"), F.col(vec_col)).alias("score"),
                *extra_cols,
            )
        )

    out = _ranked(scored, k, per_crowding_k, crowding_col).select(
        "query_id", "rank", "neighbor_id", "score", *extra_cols
    )

    if metadata_df is not None:
        # Hydration join (Q7): the top-k result is tiny -- broadcast it,
        # not the metadata table, so the big side streams.
        meta_cols = [c for c in metadata_df.columns if c != metadata_key]
        keep_extra = [c for c in extra_cols if c not in meta_cols]
        out = out.join(
            metadata_df.withColumnRenamed(metadata_key, "neighbor_id"),
            "neighbor_id",
            "left",
        ).select("query_id", "rank", "neighbor_id", "score",
                 *keep_extra, *meta_cols)
    return out


def _gemm_score_local_topk(
    index_df: DataFrame,
    queries_df: DataFrame,
    k: int,
    *,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    per_crowding_k: int | None,
    crowding_col: str | None,
) -> DataFrame:
    """Score with one float64 GEMM per Arrow batch; emit only local winners.

    The query set is collected to the driver (it is the small side by
    contract -- the reference serves one query vector per request) and
    shipped to tasks via closure; at ~100k queries x 768 dims that is
    ~600 MB and should move to a broadcast-join strategy instead.
    """
    from pyspark.sql import types as T

    qid_type = queries_df.schema[query_id_col].dataType
    nid_type = index_df.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField("query_id", qid_type),
        T.StructField("neighbor_id", nid_type),
        T.StructField("score", T.DoubleType()),
    ])
    if crowding_col:
        out_schema.add(crowding_col, index_df.schema[crowding_col].dataType)

    rows = queries_df.select(query_id_col, query_vec_col).collect()
    if not rows:
        return index_df.sparkSession.createDataFrame([], out_schema)
    qids = [r[0] for r in rows]
    qmat = np.asarray([r[1] for r in rows], dtype=np.float64)  # (nq, dim)

    has_crowd = per_crowding_k is not None and crowding_col is not None
    cols = [id_col, vec_col] + ([crowding_col] if crowding_col else [])

    # Spread the GEMM across cores when the index arrived as few files.
    par = index_df.sparkSession.sparkContext.defaultParallelism
    if index_df.rdd.getNumPartitions() < par:
        index_df = index_df.repartition(par)

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nq = len(qids)
        for pdf in batches:
            if pdf.empty:
                continue
            vmat = np.asarray(list(pdf[vec_col]), dtype=np.float64)  # (nv, dim)
            scores = qmat @ vmat.T  # (nq, nv)
            nv = scores.shape[1]
            ids = pdf[id_col].to_numpy()
            crowd = pdf[crowding_col].to_numpy() if crowding_col else None
            frames = []
            for qi in range(nq):
                s = scores[qi]
                if has_crowd:
                    # Exact local prune: cap per crowd group, then top-k.
                    df_local = pd.DataFrame(
                        {"neighbor_id": ids, "score": s, "crowd": crowd}
                    ).sort_values(
                        ["score", "neighbor_id"], ascending=[False, True]
                    )
                    df_local = df_local.groupby("crowd", sort=False).head(
                        per_crowding_k
                    ).head(k)
                    frames.append(pd.DataFrame({
                        "query_id": qids[qi],
                        "neighbor_id": df_local["neighbor_id"],
                        "score": df_local["score"],
                        crowding_col: df_local["crowd"],
                    }))
                else:
                    top = min(k, nv)
                    if top < nv:
                        # Everything at-or-above the top-th score stays a
                        # candidate, so the (score desc, id asc) tie-break
                        # below matches the global window exactly.
                        threshold = np.partition(s, nv - top)[nv - top]
                        cand = np.nonzero(s >= threshold)[0]
                    else:
                        cand = np.arange(nv)
                    order = np.lexsort((ids[cand], -s[cand]))[:top]
                    idx = cand[order]
                    out = pd.DataFrame({
                        "query_id": qids[qi],
                        "neighbor_id": ids[idx],
                        "score": s[idx],
                    })
                    if crowding_col:
                        out[crowding_col] = crowd[idx]
                    frames.append(out)
            yield pd.concat(frames, ignore_index=True)

    return index_df.select(*cols).mapInPandas(score_batches, out_schema)


def brute_force_topk(
    index_df: DataFrame,
    queries_df: DataFrame,
    k: int,
    **kwargs,
) -> DataFrame:
    """Exact-scan baseline (alias of knn_search with the fold strategy)."""
    return knn_search(index_df, queries_df, k, method="fold", **kwargs)


def knn_search_blocked(
    index_df: DataFrame,
    queries_df: DataFrame,
    k: int,
    *,
    query_id_col: str = "query_id",
    max_queries_per_block: int = 4096,
    **kwargs,
) -> DataFrame:
    """Exact GEMM kNN for query sets too large to ship in one closure.

    The gemm strategy holds the whole query matrix per task; past ~1e5
    x 768-dim queries (~600 MB) that stops scaling. This splits the
    query set into blocks of ``max_queries_per_block``, runs the gemm
    search per block, and unions the plans -- Spark schedules the block
    jobs back-to-back over the same cached index scan, so peak task
    memory is bounded by one block while total work stays one GEMM per
    (block x batch). Deterministic block assignment = hash(query_id) so
    re-runs are stable.
    """
    from pyspark.sql import functions as F

    n_blocks_row = queries_df.select(
        (F.count(F.lit(1)) / max_queries_per_block).alias("b")
    ).first()
    import math

    n_blocks = max(1, math.ceil(n_blocks_row.b))
    if n_blocks == 1:
        return knn_search(
            index_df, queries_df, k, query_id_col=query_id_col,
            method="gemm", **kwargs,
        )
    blocked = queries_df.withColumn(
        "_qblock", F.pmod(F.hash(F.col(query_id_col)), F.lit(n_blocks))
    )
    parts = [
        knn_search(
            index_df,
            blocked.filter(F.col("_qblock") == b).drop("_qblock"),
            k,
            query_id_col=query_id_col,
            method="gemm",
            **kwargs,
        )
        for b in range(n_blocks)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
