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
  product, so per-query skew in the window stage is bounded. The
  query matrix ships via ``SparkContext.broadcast`` (driver
  materialization + torrent broadcast -- the exact mechanism of
  Spark's own BroadcastExchange), NOT via task closure, so executors
  fetch it once instead of once per task and the task-serialization
  ceiling disappears.

- ``method="gemm_join"``: two-sided block-partitioned GEMM via
  ``cogroup().applyInPandas`` -- NO driver collect anywhere. The
  index hashes into ``n_index_blocks``, queries replicate across the
  blocks (and optionally split into query blocks, replicating the
  index instead), each cogroup runs one GEMM + exact local top-k.
  Costs one shuffle of the index; use it when the query set is too
  big to materialize on the driver at all, i.e. when BOTH sides are
  data-scale. For request-scale query sets prefer "gemm", which
  streams the index in place with no shuffle.

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

# Above this many query rows the driver-materializing strategies
# (SparkContext.broadcast of the query matrix / broadcast join of the
# query side) stop being safe: 65536 x 768-dim float64 is ~400 MB of
# driver + executor memory per fetch. The auto switch flips to the
# cogroup paths past it.
DEFAULT_QUERY_DRIVER_THRESHOLD = 65_536


def _resolve_query_method(
    queries_df: DataFrame,
    method: str,
    *,
    small: str,
    large: str,
    threshold: int | None = None,
) -> str:
    """``method="auto"`` -> count-based strategy switch (the
    cluster.py size-switch pattern applied to the query side): at or
    under ``threshold`` query rows pick ``small`` (driver-broadcast,
    zero-shuffle scoring -- the request-scale fast path), above it pick
    ``large`` (cogroup block scoring -- no driver materialization
    anywhere). The one count() job is the price of not making the
    caller know their scale; pass an explicit method to skip it.
    """
    if method != "auto":
        return method
    t = DEFAULT_QUERY_DRIVER_THRESHOLD if threshold is None else threshold
    return small if queries_df.count() <= t else large


def _score_block(
    qids,
    qmat: np.ndarray,
    ids,
    vmat: np.ndarray,
    k: int,
    *,
    crowd=None,
    per_crowding_k: int | None = None,
    crowding_col: str | None = None,
    probe_mask: np.ndarray | None = None,
    clusters=None,
) -> list[pd.DataFrame]:
    """One float64 GEMM over (query set x vector block); emit only local
    winners per query. Shared by every gemm strategy (mapInPandas,
    cogroup, IVF-masked) so their scores are computed identically.

    ``probe_mask`` (nq x n_clusters bool) + ``clusters`` (per-vector
    cluster id) restrict each query to its probed clusters (IVF).
    """
    scores = qmat @ vmat.T  # (nq, nv)
    if probe_mask is not None:
        allowed = probe_mask[:, clusters]  # (nq, nv)
        scores = np.where(allowed, scores, -np.inf)
    nv = scores.shape[1]
    has_crowd = per_crowding_k is not None and crowding_col is not None
    frames: list[pd.DataFrame] = []
    for qi in range(len(qids)):
        s = scores[qi]
        if probe_mask is not None:
            valid = s > -np.inf
            if not valid.any():
                continue
            n_valid = int(valid.sum())
        else:
            n_valid = nv
        if has_crowd:
            # Exact local prune: cap per crowd group, then top-k.
            df_local = pd.DataFrame(
                {"neighbor_id": ids, "score": s, "crowd": crowd}
            )
            if probe_mask is not None:
                df_local = df_local[valid]
            df_local = df_local.sort_values(
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
            top = min(k, n_valid)
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
    return frames


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
    method: str = "auto",
    auto_threshold: int | None = None,
) -> DataFrame:
    """Filtered, diversity-constrained top-k search.

    Returns (query_id, rank, neighbor_id, score[, crowding_col,
    metadata...]). ``restrict`` is applied BEFORE scoring so Catalyst
    can push it to the parquet scan (the reference filters inside the
    ANN traversal for the same reason, setup_vector_search.py:45-62).

    ``method="auto"`` picks "gemm" for query sets at or under
    ``auto_threshold`` (default DEFAULT_QUERY_DRIVER_THRESHOLD) and the
    collect-free "gemm_join" above it, so callers who don't know their
    query scale get the scale-safe strategy by default instead of a
    silent driver OOM.
    """
    method = _resolve_query_method(
        queries_df, method, small="gemm", large="gemm_join",
        threshold=auto_threshold,
    )
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
    elif method == "gemm_join":
        scored = gemm_topk_cogroup(
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

    The query matrix is materialized on the driver and shipped with
    ``SparkContext.broadcast`` -- the same mechanism (driver collect +
    torrent broadcast, one copy per executor) Spark's BroadcastExchange
    uses for the build side of a broadcast join. Query sets too large
    to materialize on the driver at all should use ``gemm_topk_cogroup``
    (no driver collect, costs an index shuffle) or knn_search_blocked.
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
    bc = index_df.sparkSession.sparkContext.broadcast(
        ([r[0] for r in rows],
         np.asarray([r[1] for r in rows], dtype=np.float64))  # (nq, dim)
    )

    cols = [id_col, vec_col] + ([crowding_col] if crowding_col else [])

    # Spread the GEMM across cores when the index arrived as few files.
    par = index_df.sparkSession.sparkContext.defaultParallelism
    if index_df.rdd.getNumPartitions() < par:
        index_df = index_df.repartition(par)

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids, qmat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            frames = _score_block(
                qids, qmat,
                pdf[id_col].to_numpy(),
                np.asarray(list(pdf[vec_col]), dtype=np.float64),
                k,
                crowd=pdf[crowding_col].to_numpy() if crowding_col else None,
                per_crowding_k=per_crowding_k, crowding_col=crowding_col,
            )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return index_df.select(*cols).mapInPandas(score_batches, out_schema)


def gemm_topk_cogroup(
    index_df: DataFrame,
    queries_df: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vector",
    per_crowding_k: int | None = None,
    crowding_col: str | None = None,
    n_index_blocks: int | None = None,
    n_query_blocks: int = 1,
    probe_col: str | None = None,
    cluster_col: str | None = None,
    n_clusters: int | None = None,
) -> DataFrame:
    """Fully-distributed block GEMM scoring: NO driver collect anywhere.

    Both sides stay DataFrames end-to-end: the index hashes into
    ``n_index_blocks``, each query row replicates across those blocks
    (``explode`` through the shuffle -- queries are the small side, so
    replicating them is the cheap direction), and every
    ``cogroup().applyInPandas`` group runs one GEMM + exact local
    top-k via ``_score_block``. ``n_query_blocks > 1`` additionally
    splits queries (replicating the index per query block) to bound
    per-task memory for data-scale query sets.

    Each (query, vector) pair lands in exactly one cogroup, so the
    union of local winners needs no dedup before the global window
    (applied by the caller via ``_ranked``).

    IVF masking: pass ``probe_col`` (array<int> probed clusters per
    query), ``cluster_col`` and ``n_clusters`` -- the mask is rebuilt
    per group from the probe column, still with no driver state.

    Returns the scored-candidates DataFrame (query_id, neighbor_id,
    score[, crowding_col]).
    """
    from pyspark.sql import types as T

    spark = index_df.sparkSession
    if n_index_blocks is None:
        n_index_blocks = spark.sparkContext.defaultParallelism
    if probe_col is not None and (cluster_col is None or n_clusters is None):
        raise ValueError("probe_col requires cluster_col and n_clusters")

    icols = [id_col, vec_col]
    if crowding_col:
        icols.append(crowding_col)
    if cluster_col:
        icols.append(cluster_col)
    # Both sides' grouping keys are explicitly bigint: pmod(xxhash64)
    # is bigint while exploded int literals are int, and cogroup key
    # matching must not lean on implicit coercion.
    idx = index_df.select(*icols).withColumn(
        "_ib", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_index_blocks))
    )
    if n_query_blocks > 1:
        idx = idx.withColumn(
            "_qb",
            F.explode(F.array(*[F.lit(i).cast("bigint")
                                for i in range(n_query_blocks)])),
        )
        qb_expr = F.pmod(F.xxhash64(F.col(query_id_col)), F.lit(n_query_blocks))
    else:
        idx = idx.withColumn("_qb", F.lit(0).cast("bigint"))
        qb_expr = F.lit(0).cast("bigint")

    qcols = [query_id_col, query_vec_col]
    if probe_col:
        qcols.append(probe_col)
    qry = queries_df.select(*qcols).withColumn("_qb", qb_expr).withColumn(
        "_ib", F.explode(F.array(*[F.lit(i).cast("bigint")
                                   for i in range(n_index_blocks)]))
    )

    out_schema = T.StructType([
        T.StructField("query_id", queries_df.schema[query_id_col].dataType),
        T.StructField("neighbor_id", index_df.schema[id_col].dataType),
        T.StructField("score", T.DoubleType()),
    ])
    if crowding_col:
        out_schema.add(crowding_col, index_df.schema[crowding_col].dataType)
    empty = pd.DataFrame({f.name: pd.Series(dtype=object) for f in out_schema})

    def score_group(ipdf: pd.DataFrame, qpdf: pd.DataFrame) -> pd.DataFrame:
        if ipdf.empty or qpdf.empty:
            return empty
        qids = qpdf[query_id_col].to_numpy()
        qmat = np.asarray(list(qpdf[query_vec_col]), dtype=np.float64)
        probe_mask = None
        clusters = None
        if probe_col:
            probe_mask = np.zeros((len(qids), n_clusters), dtype=bool)
            for i, lst in enumerate(qpdf[probe_col]):
                probe_mask[i, np.asarray(lst, dtype=np.int64)] = True
            clusters = ipdf[cluster_col].to_numpy()
        frames = _score_block(
            qids, qmat,
            ipdf[id_col].to_numpy(),
            np.asarray(list(ipdf[vec_col]), dtype=np.float64),
            k,
            crowd=ipdf[crowding_col].to_numpy() if crowding_col else None,
            per_crowding_k=per_crowding_k, crowding_col=crowding_col,
            probe_mask=probe_mask, clusters=clusters,
        )
        if not frames:
            return empty
        return pd.concat(frames, ignore_index=True)

    return (
        idx.groupby("_ib", "_qb")
        .cogroup(qry.groupby("_ib", "_qb"))
        .applyInPandas(score_group, out_schema)
    )


def knn_search_cosine(
    index_df: DataFrame,
    queries_df: DataFrame,
    k: int,
    *,
    vec_col: str = "embedding",
    query_vec_col: str = "query_vector",
    **kwargs,
) -> DataFrame:
    """COSINE_DISTANCE counterpart of the dot-product search (the
    Vertex FindNeighbors contract enumerates COSINE alongside
    DOT_PRODUCT; the reference's unit-normalized embeddings make them
    coincide, arbitrary vectors do not): unit-normalize BOTH sides with
    the fold-mirrorable ``l2_normalize``, then reuse ``knn_search``
    verbatim -- every physical strategy (fold / gemm / cogroup / auto)
    inherits cosine for free, and the returned ``score`` IS the cosine
    similarity."""
    from ..functions.vector import l2_normalize

    idx = index_df.withColumn(vec_col, l2_normalize(F.col(vec_col)))
    qry = queries_df.withColumn(
        query_vec_col, l2_normalize(F.col(query_vec_col))
    )
    return knn_search(
        idx, qry, k, vec_col=vec_col, query_vec_col=query_vec_col, **kwargs
    )


def knn_search_l2(
    index_df: DataFrame,
    queries_df: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vector",
    **kwargs,
) -> DataFrame:
    """SQUARED_L2_DISTANCE search via the classic MIPS reduction:
    argmin ||q - v||^2 == argmax (q.v - 0.5*||v||^2), so augmenting
    index vectors with [-0.5*|v|^2] and queries with [1.0] turns L2
    nearest-neighbor into the dot-product search every strategy here
    already implements -- fold, GEMM, cogroup, IVF layouts, the lot,
    with zero changes to their internals.

    The ranking key is the augmented dot product (deterministic,
    fold-mirrorable); the returned ``score`` is the actual squared
    distance, rehydrated exactly for the k winners by joining the
    (tiny) result back to both vector tables -- two broadcast joins of
    a top-k-sized side, the Q7 hydration shape."""
    from ..functions.vector import dot_product as dd

    aug_v = F.concat(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        F.array(F.lit(-0.5) * dd(F.col(vec_col), F.col(vec_col))),
    )
    aug_q = F.concat(
        F.transform(F.col(query_vec_col), lambda x: x.cast("double")),
        F.array(F.lit(1.0)),
    )
    idx = index_df.withColumn("_augv", aug_v)
    qry = queries_df.withColumn("_augq", aug_q)
    ranked = knn_search(
        idx, qry, k,
        id_col=id_col, vec_col="_augv",
        query_id_col=query_id_col, query_vec_col="_augq",
        **kwargs,
    ).select("query_id", "rank", "neighbor_id")
    q_side = queries_df.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("_qv"),
    )
    v_side = index_df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vv")
    )
    from ..functions.vector import squared_l2

    small = ranked.join(F.broadcast(q_side), "query_id")
    # broadcast the top-k side so the full vector table streams
    return v_side.join(F.broadcast(small), "neighbor_id").select(
        "query_id",
        "rank",
        "neighbor_id",
        squared_l2(F.col("_qv"), F.col("_vv")).alias("score"),
    )


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
