"""Deterministic train/validation/test splits.

A training-data pipeline must split a corpus REPRODUCIBLY: the same
document lands in the same split on every run, on any cluster size, and
after any upsert -- `df.randomSplit` gives none of that (it reshuffles
whenever partitioning changes). The standard fix is hash-bucketing the
stable document key: bucket = H(salt || id) mod B, then carve [0, B)
into contiguous split ranges.

Spark-first shape: one narrow projection -- no shuffle, no state, no
sampling pass. At 100 TB the split column is computed inline during the
scan and is itself a fine partition column for writing split-separated
outputs. Changing ``salt`` re-rolls the assignment wholesale (a new
epoch); growing ``weights`` ranges keeps earlier members stable (the
train range only widens).

The default hash is the engine's sha60 (functions/text.py::sha60_hash)
so the assignment is bit-reproducible in any SQL engine for auditing:
DuckDB mirror is ('0x' || substr(sha256(salt || '|' || id), 1, 15))
::BIGINT % B. xxhash64 is the cheaper non-auditable option.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import base_hash_fn

DEFAULT_WEIGHTS: dict[str, float] = {"train": 0.9, "val": 0.05, "test": 0.05}


def split_bounds(
    weights: dict[str, float] | None = None, buckets: int = 10_000
) -> list[tuple[str, int]]:
    """[(split_name, exclusive_upper_bucket)] with the last bound forced
    to ``buckets`` so rounding never orphans a bucket."""
    weights = weights or DEFAULT_WEIGHTS
    total = sum(weights.values())
    bounds: list[tuple[str, int]] = []
    acc = 0.0
    for name, w in weights.items():
        acc += w / total
        bounds.append((name, int(round(acc * buckets))))
    bounds[-1] = (bounds[-1][0], buckets)
    return bounds


def split_assignment(
    id_col: Column | str,
    *,
    weights: dict[str, float] | None = None,
    salt: str = "v1",
    buckets: int = 10_000,
    base_hash: str = "sha60",
) -> tuple[Column, Column]:
    """(bucket, split) columns for a stable id column.

    bucket = H(salt || '|' || id) mod buckets  (H >= 0, so % == pmod);
    split  = first range of ``weights`` (insertion order) containing it.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    hash_fn = base_hash_fn(base_hash)
    raw = hash_fn(F.concat_ws("|", F.lit(salt), c.cast("string")))
    bucket = F.pmod(raw, F.lit(buckets))
    split: Column | None = None
    expr = F.lit(None).cast("string")
    for name, upper in reversed(split_bounds(weights, buckets)):
        expr = F.when(bucket < upper, F.lit(name)).otherwise(expr)
    split = expr
    return bucket.cast("long"), split


def weighted_sample(
    df: DataFrame,
    rates: dict[str, float],
    *,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix1",
    buckets: int = 10_000,
    base_hash: str = "sha60",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling -- the dataset-MIXING
    primitive (e.g. keep 100% of en, 30% of crawl, 5% of boilerplate
    source). Same hash-bucket trick as the splits: a row survives iff
    ``H(salt||id) mod buckets < rate * buckets``, so membership is
    reproducible across runs/cluster sizes/upserts and NESTED across
    rates (the 5% sample is a subset of the 30% sample -- lowering a
    stratum's rate only removes rows). One narrow filter, no shuffle,
    no sampling pass; strata not in ``rates`` fall back to
    ``default_rate``.
    """
    c = F.col(id_col)
    hash_fn = base_hash_fn(base_hash)
    bucket = F.pmod(
        hash_fn(F.concat_ws("|", F.lit(salt), c.cast("string"))),
        F.lit(buckets),
    )
    cutoff = F.lit(int(round(default_rate * buckets)))
    for name, rate in rates.items():
        cutoff = F.when(
            F.col(stratum_col) == name, F.lit(int(round(rate * buckets)))
        ).otherwise(cutoff)
    return df.filter(bucket < cutoff)


def weighted_upsample(
    df: DataFrame,
    rates: dict[str, float],
    *,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix1",
    buckets: int = 10_000,
    base_hash: str = "sha60",
    default_rate: float = 1.0,
    copy_col: str = "copy_id",
) -> DataFrame:
    """Mixing with rates above 1.0: deterministic OVER-sampling.

    A rate of 2.3 emits 2 copies of every row plus a 3rd for the 30%
    of rows whose hash bucket falls under the fractional part -- the
    epoch-style repetition recipe (e.g. Wikipedia seen 2-3x per epoch)
    without any RNG: reruns, cluster sizes, and upserts all reproduce
    the same copy multiset. Rates below 1.0 downsample exactly like
    ``weighted_sample``. Emits ``copy_col`` (1..n) so downstream
    packing/shuffling can spread copies; rows with 0 copies disappear
    (explode of an empty sequence).
    """
    c = F.col(id_col)
    hash_fn = base_hash_fn(base_hash)
    bucket = F.pmod(
        hash_fn(F.concat_ws("|", F.lit(salt), c.cast("string"))),
        F.lit(buckets),
    )

    def n_copies(rate: float):
        whole = int(rate)
        frac_cut = int(round((rate - whole) * buckets))
        return F.lit(whole) + (bucket < F.lit(frac_cut)).cast("int")

    n = n_copies(default_rate)
    for name, rate in rates.items():
        n = F.when(F.col(stratum_col) == name, n_copies(rate)).otherwise(n)
    return df.withColumn("_n_copies", n).select(
        "*",
        F.explode(
            F.when(
                F.col("_n_copies") >= 1,
                F.sequence(F.lit(1), F.col("_n_copies")),
            ).otherwise(F.array().cast("array<int>"))
        ).alias(copy_col),
    ).drop("_n_copies")


def assign_splits(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    weights: dict[str, float] | None = None,
    salt: str = "v1",
    buckets: int = 10_000,
    base_hash: str = "sha60",
    bucket_col: str = "split_bucket",
    split_col: str = "split",
) -> DataFrame:
    """Append deterministic ``split_bucket`` and ``split`` columns."""
    bucket, split = split_assignment(
        id_col, weights=weights, salt=salt, buckets=buckets, base_hash=base_hash
    )
    return df.withColumn(bucket_col, bucket).withColumn(split_col, split)


def cap_per_group(
    df: DataFrame,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    max_per_group: int = 100,
    salt: str = "cap1",
    base_hash: str = "sha60",
) -> DataFrame:
    """Deterministic per-group cap -- the RefinedWeb-style per-domain
    limit (no single site may dominate the corpus). Rows rank within
    their group by ``H(salt || id)`` (hash order == an unbiased but
    fully reproducible shuffle; the id tiebreak makes ranks total), and
    only the first ``max_per_group`` survive.

    Properties the hash ordering buys at 100 TB:
    - reproducible across runs, cluster sizes, and partitionings;
    - STABLE UNDER GROWTH in the keep direction a training pipeline
      wants: newly crawled pages insert into the hash order uniformly,
      so the kept set churns minimally instead of shifting wholesale;
    - unbiased within the group (no correlation with crawl order or
      storage order, which plain LIMIT would have).

    One shuffle keyed on the group column; per-group state is a
    row_number stream, and group skew is bounded by the biggest
    domain's row count (salt the group into sub-shards first if one
    domain exceeds a task's comfort).
    """
    from pyspark.sql import Window

    hash_fn = base_hash_fn(base_hash)
    order = hash_fn(
        F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(
        order.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_cap_rn", F.row_number().over(w))
        .filter(F.col("_cap_rn") <= max_per_group)
        .drop("_cap_rn")
    )
