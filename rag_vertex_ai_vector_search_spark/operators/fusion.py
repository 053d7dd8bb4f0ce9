"""Reciprocal-rank fusion: combine heterogeneous rankings into one.

The standard hybrid-retrieval combinator (Cormack, Clarke & Buettcher,
SIGIR 2009): given per-source ranks of the same candidates,

    rrf(d) = sum_s 1 / (k + rank_s(d))        (k = 60 by convention)

Rank-based, so sources with incomparable score scales (dot-product
similarity vs BM25) fuse without normalization -- exactly the
vector + lexical pair this engine serves (knn_search + bm25_topk).

Determinism note: the fusion is built as a chain of full-outer joins
with the per-source contributions added in a FIXED expression order
(never a groupBy SUM over doubles, whose addition order is
shuffle-dependent for 3+ sources) -- the fused score is bit-reproducible
and therefore oracle-checkable. A document missing from a source
contributes 0. Top-k results are tiny, so the joins broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def reciprocal_rank_fusion(
    ranked: dict[str, DataFrame],
    *,
    k: int = 60,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    rank_col: str = "rank",
    top_n: int | None = None,
) -> DataFrame:
    """Fuse named rankings (each (query_col, id_col, rank_col)) into
    (query_col, id_col, rrf_score, per-source contributions, rank)."""
    if not ranked:
        raise ValueError("need at least one ranking")
    keys = [query_col, id_col]
    out: DataFrame | None = None
    for name, df in ranked.items():
        side = df.select(
            *keys,
            (
                F.lit(1.0)
                / (F.lit(float(k)) + F.col(rank_col).cast("double"))
            ).alias(f"rrf_{name}"),
        )
        out = side if out is None else out.join(side, keys, "full_outer")
    assert out is not None
    score = None
    for name in ranked:
        contrib = F.coalesce(F.col(f"rrf_{name}"), F.lit(0.0))
        score = contrib if score is None else score + contrib
    out = out.withColumn("rrf_score", score)
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    out = out.withColumn("rank", F.row_number().over(w).cast("long"))
    if top_n is not None:
        out = out.filter(F.col("rank") <= top_n)
    return out
