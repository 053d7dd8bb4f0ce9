"""Retrieval-quality evaluation: recall@k of an approximate search
path against exact ground truth.

Every ANN family in the engine (IVF, IVF2, LSH, PQ) trades recall for
pruned bytes; this operator is the measurement loop that tunes those
knobs (probe_percent, bands, rerank_candidates) on a sample before
committing a 100 TB index layout. The engine's pytest recall gates
(test_ivf.py >= 0.95 etc.) are this same computation pinned to
thresholds.

Scale shape: both inputs are top-k result sets -- n_queries x k rows
by construction, NOT corpus-sized -- so the hit join and the per-query
aggregate are bounded shuffles whatever the underlying corpus was. The
exact side comes from knn_search over a query SAMPLE (ground truth for
every query would defeat the index); sampling queries is the
documented practice (Aumüller et al., ann-benchmarks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_report(
    approx_df: DataFrame,
    exact_df: DataFrame,
    *,
    query_id_col: str = "query_id",
    neighbor_id_col: str = "neighbor_id",
) -> DataFrame:
    """(query_id, n_exact, n_approx, n_hits, recall) per query:
    ``recall`` = |approx ∩ exact| / |exact| -- recall@k when both
    sides are top-k result sets. Queries present on either side are
    reported (missing side counts as 0; recall 0.0 when the truth set
    is empty).
    """
    exact = exact_df.select(
        F.col(query_id_col).alias("_q"), F.col(neighbor_id_col).alias("_n")
    )
    approx = approx_df.select(
        F.col(query_id_col).alias("_q"), F.col(neighbor_id_col).alias("_n")
    )
    n_exact = exact.groupBy("_q").agg(F.count(F.lit(1)).alias("n_exact"))
    n_approx = approx.groupBy("_q").agg(F.count(F.lit(1)).alias("n_approx"))
    hits = (
        approx.join(exact, ["_q", "_n"], "left_semi")
        .groupBy("_q")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        n_exact.join(n_approx, "_q", "full")
        .join(hits, "_q", "left")
        .select(
            F.col("_q").alias(query_id_col),
            F.coalesce(F.col("n_exact"), F.lit(0)).cast("long").alias(
                "n_exact"
            ),
            F.coalesce(F.col("n_approx"), F.lit(0)).cast("long").alias(
                "n_approx"
            ),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias(
                "n_hits"
            ),
            F.when(
                F.coalesce(F.col("n_exact"), F.lit(0)) > 0,
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.col("n_exact").cast("double"),
            ).otherwise(F.lit(0.0)).alias("recall"),
        )
    )


def recall_summary(
    report: DataFrame, *, query_id_col: str = "query_id"
) -> DataFrame:
    """One-row macro summary of a recall_report: mean/min recall and
    the fraction of queries at perfect recall -- the numbers an index
    tuning sweep compares across configurations."""
    return report.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.avg("recall").alias("mean_recall"),
        F.min("recall").alias("min_recall"),
        F.avg(
            F.when(F.col("recall") >= 1.0, F.lit(1.0)).otherwise(F.lit(0.0))
        ).alias("frac_perfect"),
    )
