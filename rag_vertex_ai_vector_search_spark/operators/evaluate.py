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
    """One-row summary of a recall_report: micro-averaged recall,
    worst-query recall and the fraction of queries at perfect recall
    -- the numbers an index tuning sweep compares across
    configurations.

    Every column is order-independent by construction (r7), so the
    summary is bit-reproducible across partitionings and engines:
    integer counter sums (``sum_hits``/``sum_exact``/``n_perfect``)
    with ONE exact double division each for the two rates, and a
    ``min`` (a selection, not an accumulation) for the floor.
    ``micro_recall`` = sum(n_hits)/sum(n_exact) equals the macro mean
    recall whenever n_exact is uniform across queries (the top-k
    evaluation case); a float ``avg(recall)`` would reassociate under
    partitioning and is deliberately not offered."""
    return report.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum("n_exact").cast("long").alias("sum_exact"),
        F.sum("n_hits").cast("long").alias("sum_hits"),
        F.min("recall").alias("min_recall"),
        F.sum((F.col("recall") >= 1.0).cast("long")).alias("n_perfect"),
    ).select(
        "n_queries",
        "sum_exact",
        "sum_hits",
        F.when(
            F.col("sum_exact") > 0,
            F.col("sum_hits").cast("double")
            / F.col("sum_exact").cast("double"),
        ).otherwise(F.lit(0.0)).alias("micro_recall"),
        "min_recall",
        "n_perfect",
        (
            F.col("n_perfect").cast("double")
            / F.col("n_queries").cast("double")
        ).alias("frac_perfect"),
    )


def discount_literals(k: int) -> list[float]:
    """log2(pos + 1) for pos 1..k as plain Python doubles -- the shared
    discount table both ranking_metrics and its SQL oracle inline (see
    the determinism note in ranking_metrics)."""
    import math

    return [math.log2(pos + 1.0) for pos in range(1, k + 1)]


def ranking_metrics(
    results: DataFrame,
    qrels: DataFrame,
    *,
    k: int = 10,
    query_id_col: str = "query_id",
    neighbor_id_col: str = "neighbor_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Classic ranked-retrieval metrics per query: reciprocal rank,
    DCG@k, ideal DCG@k and nDCG@k (Jarvelin & Kekalainen 2002) --
    the evaluation companion to recall_report when result ORDER
    matters (hybrid search, reranking cascades).

    ``results``: (query, neighbor, rank) with rank 1-based;
    ``qrels``: (query, neighbor, rel) graded relevance (missing pairs
    = rel 0). Output: (query_id, n_rel, first_rel_rank, rr, dcg,
    idcg, ndcg); queries with no relevant documents report 0.0
    metrics and first_rel_rank null.

    IDCG follows the standard definition: the ideal ordering over ALL
    judged relevant documents in qrels (rels sorted descending),
    truncated at k -- NOT just the rels of the retrieved top-k. A
    ranking that misses relevant documents entirely therefore scores
    ndcg < 1 (the same-set "local" variant would report 1.0).

    Determinism across engines: both DCG and IDCG are SEQUENTIAL
    folds over rank-sorted gain lists (F.aggregate == DuckDB
    list_reduce), so the float sums are bit-reproducible -- no
    order-dependent SUM(). The log2 discounts are PRECOMPUTED as k
    Python doubles and inlined as literals (JVM log2 = ln/ln2 differs
    from DuckDB's native log2 in the last ulp at e.g. x=9,10,11, and
    from DuckDB's ln-ratio at x=3 -- no shared expression exists, so
    the literal table is the only bit-stable discount source; see
    discount_literals()). Scale shape: everything is top-k-sized
    joins and per-query folds, bounded by n_queries x k.
    """
    r = results.select(
        F.col(query_id_col).alias("_q"),
        F.col(neighbor_id_col).alias("_n"),
        F.col(rank_col).cast("long").alias("_rank"),
    ).filter(F.col("_rank") <= k)
    j = qrels.select(
        F.col(query_id_col).alias("_q"),
        F.col(neighbor_id_col).alias("_n"),
        F.col(rel_col).cast("double").alias("_rel"),
    )
    scored = r.join(j, ["_q", "_n"], "left").withColumn(
        "_rel", F.coalesce(F.col("_rel"), F.lit(0.0))
    )

    def fold_sum(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    per_q = scored.groupBy("_q").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("_rank"), F.col("_rel")))
        ).alias("_by_rank"),
        F.min(
            F.when(F.col("_rel") > 0, F.col("_rank"))
        ).alias("first_rel_rank"),
    )
    discounts = F.array(*[F.lit(d) for d in discount_literals(k)])
    # gains in rank order: (2^rel - 1) / log2(rank + 1)
    dcg_terms = F.transform(
        F.col("_by_rank"),
        lambda s: (F.pow(F.lit(2.0), s.getField("_rel")) - F.lit(1.0))
        / F.element_at(discounts, s.getField("_rank").cast("int")),
    )
    # Ideal ordering over ALL judged relevant docs (qrels side, not
    # the retrieved set): rels sorted descending, truncated at k.
    # rel = 0 terms contribute (2^0 - 1) = 0 and sort last, so
    # filtering them first never changes the truncated ideal prefix.
    # sort_array of the VALUES is tie-insensitive, so the fold is
    # bit-deterministic whatever order collect_list saw the rows in.
    ideal = j.filter(F.col("_rel") > 0).groupBy("_q").agg(
        F.slice(
            F.sort_array(F.collect_list("_rel"), asc=False), 1, k
        ).alias("_ideal_rels"),
        F.count(F.lit(1)).cast("long").alias("n_rel"),
    )
    idcg_terms = F.zip_with(
        F.col("_ideal_rels"),
        F.sequence(
            F.lit(1), F.greatest(F.size("_ideal_rels"), F.lit(1))
        ),
        lambda rel, pos: (F.pow(F.lit(2.0), rel) - F.lit(1.0))
        / F.element_at(discounts, pos.cast("int")),
    )
    out = per_q.join(ideal, "_q", "left").select(
        F.col("_q").alias(query_id_col),
        F.coalesce(F.col("n_rel"), F.lit(0)).cast("long").alias("n_rel"),
        "first_rel_rank",
        F.coalesce(
            1.0 / F.col("first_rel_rank").cast("double"), F.lit(0.0)
        ).alias("rr"),
        fold_sum(dcg_terms).alias("dcg"),
        F.coalesce(fold_sum(idcg_terms), F.lit(0.0)).alias("idcg"),
    )
    return out.withColumn(
        "ndcg",
        F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")).otherwise(
            F.lit(0.0)
        ),
    )


def dim_prefix_recall(
    emb: DataFrame,
    queries: DataFrame,
    *,
    dims: tuple[int, ...],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vector",
    method: str = "fold",
) -> DataFrame:
    """Recall curve of DIMENSION-TRUNCATED exact search vs full-dim
    truth: one summary row per prefix length L in ``dims`` --
    ``(prefix_dim, n_queries, sum_exact, sum_hits, micro_recall,
    min_recall, n_perfect, frac_perfect)``.

    The ablation behind Matryoshka-style embeddings (Kusupati et al.
    2022): if recall@k at L=dim/4 is close to 1, the index can store
    the prefix and cut vector bytes 4x (or use prefix scoring as a
    cheap first pass). Both sides are exact kNN -- the curve isolates
    the cost of TRUNCATION, not of any ANN approximation; the full-dim
    L row is the sanity anchor (recall exactly 1). Scale shape: one
    kNN pass per L over a k-sized result set; the summaries are
    one-row aggregates unioned driver-free.
    """
    from .knn import knn_search

    exact = knn_search(emb, queries, k=k, method=method)
    out = None
    for dim in dims:
        emb_l = emb.select(
            F.col(id_col), F.slice(F.col(vec_col), 1, dim).alias(vec_col)
        )
        q_l = queries.select(
            F.col(query_id_col),
            F.slice(F.col(query_vec_col), 1, dim).alias(query_vec_col),
        )
        approx = knn_search(emb_l, q_l, k=k, method=method)
        summary = recall_summary(recall_report(approx, exact)).select(
            F.lit(dim).cast("int").alias("prefix_dim"), "*"
        )
        out = summary if out is None else out.unionByName(summary)
    return out


def pair_retrieval_metrics(
    candidates: DataFrame,
    truth: DataFrame,
    *,
    id_a_col: str = "id_a",
    id_b_col: str = "id_b",
) -> DataFrame:
    """One-row precision/recall of a candidate PAIR set against a
    truth pair set -- the dedup counterpart of recall_summary (tuning
    MinHash bands/threshold is the same loop as tuning ANN probes).
    Columns: n_truth, n_candidates, n_hits, precision, recall -- all
    integer counts with one exact double division each, so the whole
    report is order-independent and hash-gateable. Pairs must be
    canonicalized (id_a < id_b) on both sides."""
    c = candidates.select(id_a_col, id_b_col).distinct()
    t = truth.select(id_a_col, id_b_col).distinct()
    hits = c.join(t, [id_a_col, id_b_col], "left_semi")
    agg = (
        t.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
        .crossJoin(
            c.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
        )
        .crossJoin(hits.agg(F.count(F.lit(1)).cast("long").alias("n_hits")))
    )
    return agg.select(
        "n_truth",
        "n_candidates",
        "n_hits",
        F.when(
            F.col("n_candidates") > 0,
            F.col("n_hits").cast("double")
            / F.col("n_candidates").cast("double"),
        ).otherwise(F.lit(0.0)).alias("precision"),
        F.when(
            F.col("n_truth") > 0,
            F.col("n_hits").cast("double") / F.col("n_truth").cast("double"),
        ).otherwise(F.lit(0.0)).alias("recall"),
    )
