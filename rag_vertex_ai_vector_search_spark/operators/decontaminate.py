"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation/benchmark set.

The standard LLM-training-data hygiene step (public method: GPT-3 paper
Appendix C — 13-gram overlap; also used by PaLM / Llama reports): a
training document is "contaminated" if it shares at least
``min_shared`` distinct word n-grams with any benchmark document, and
decontamination drops those documents before training.

Spark shape (designed for a 100 TB train side):

- Both sides explode to DISTINCT word n-grams (built-in expressions,
  codegen'd — ``word_shingles``), hashed to compact 60-bit keys
  (``sha60`` for oracle parity; pass ``base_hash="xxhash64"`` for the
  cheaper production hash). The join/shuffle carries 8-byte keys, not
  ~100-byte gram strings.
- The eval side is benchmark-sized (1e4..1e6 rows — tiny next to the
  corpus), so the gram join BROADCASTS it: the train side streams
  through map-side hash probes with no shuffle of the corpus at all.
  Set ``broadcast_eval=False`` only if the eval side is itself huge.
- ``max_gram_df`` drops grams that appear in more than that many eval
  docs before joining (boilerplate guard — same df-cap idea as the
  winnowing and MinHash band caps): a license header shared by every
  eval doc must not turn the probe into a fan-out.
- Output pair cardinality is bounded by real overlap, not corpus size;
  the anti-join in ``decontaminate`` broadcasts the contaminated-id
  set back onto the corpus.

Fully SQL-expressible -> bit-exact DuckDB oracle in the driver gate
(``dataset_decontaminate`` query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import base_hash_fn, word_shingles
from ..sources import fan_out


def _gram_hashes(
    df: DataFrame, id_col: str, text_col: str, out_id: str, n: int,
    base_hash: str,
) -> DataFrame:
    # Single-file local fixtures arrive as one input partition; the
    # shingle+hash explode is CPU-heavy, so spread it (no-op when the
    # source already has splits).
    df = fan_out(df)
    hash_fn = base_hash_fn(base_hash)
    return df.select(
        F.col(id_col).alias(out_id),
        F.explode(word_shingles(F.col(text_col), n)).alias("_gram"),
    ).select(out_id, hash_fn(F.col("_gram")).alias("_gh"))


def contamination_pairs(
    train_df: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_shared: int = 1,
    max_gram_df: int | None = None,
    base_hash: str = "sha60",
    broadcast_eval: bool = True,
) -> DataFrame:
    """(train_id, eval_id, shared_grams) for every train/eval pair
    sharing >= ``min_shared`` distinct n-gram hashes.

    ``word_shingles`` is distinct-per-doc, so ``shared_grams`` counts
    distinct shared grams. n defaults to the GPT-3 paper's 13.
    """
    tr = _gram_hashes(train_df, id_col, text_col, "train_id", n, base_hash)
    ev = _gram_hashes(eval_df, id_col, text_col, "eval_id", n, base_hash)
    if max_gram_df is not None:
        # df-cap as a window over the gram key: ONE pass over the eval
        # grams (an agg + anti-join here would re-derive the eval gram
        # plan twice more -- measured 3x the query cost at sf0.1).
        from pyspark.sql import Window

        ev = (
            ev.withColumn(
                "_df", F.count(F.lit(1)).over(Window.partitionBy("_gh"))
            )
            .filter(F.col("_df") <= max_gram_df)
            .drop("_df")
        )
    if broadcast_eval:
        ev = F.broadcast(ev)
    return (
        tr.join(ev, "_gh")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").cast("long").alias("shared_grams"))
        .filter(F.col("shared_grams") >= min_shared)
    )


def cross_source_overlap(
    df: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 5,
    base_hash: str = "sha60",
) -> DataFrame:
    """Pairwise n-gram contamination MATRIX between every pair of
    corpus slices (sources, dumps, snapshots): for each (a, b) with
    a < b,

        (group_a, group_b, shared_grams, grams_a, grams_b, jaccard)

    over the groups' DISTINCT gram-hash sets. The audit a multi-source
    corpus runs before mixing -- two "independent" sources with high
    Jaccard are the same crawl twice, and a training/eval split drawn
    from them leaks.

    Scale shape: the per-group distinct-gram table is bounded by
    content (not corpus rows) and shrinks to 8-byte keys; the pair
    join is keyed on the gram hash, so cost tracks actual overlap,
    with per-gram fan-out bounded by (#groups choose 2) -- groups are
    few (sources/dumps) by construction. One distinct, one self-join,
    two broadcast-sized aggregates.
    """
    hash_fn = base_hash_fn(base_hash)
    grams = (
        fan_out(df)
        .select(
            F.col(group_col).alias("_g"),
            F.explode(word_shingles(F.col(text_col), n)).alias("_gram"),
        )
        .select("_g", hash_fn(F.col("_gram")).alias("_gh"))
        .distinct()
    )
    totals = grams.groupBy("_g").agg(F.count(F.lit(1)).alias("_tot"))
    a, b = grams.alias("a"), grams.alias("b")
    shared = (
        a.join(
            b,
            on=[
                F.col("a._gh") == F.col("b._gh"),
                F.col("a._g") < F.col("b._g"),
            ],
        )
        .groupBy(
            F.col("a._g").alias("group_a"), F.col("b._g").alias("group_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_grams"))
    )
    ta = totals.select(
        F.col("_g").alias("group_a"), F.col("_tot").alias("grams_a")
    )
    tb = totals.select(
        F.col("_g").alias("group_b"), F.col("_tot").alias("grams_b")
    )
    return (
        shared.join(ta, "group_a")
        .join(tb, "group_b")
        .select(
            "group_a",
            "group_b",
            "shared_grams",
            F.col("grams_a").cast("long").alias("grams_a"),
            F.col("grams_b").cast("long").alias("grams_b"),
            (
                F.col("shared_grams").cast("double")
                / (
                    F.col("grams_a") + F.col("grams_b")
                    - F.col("shared_grams")
                ).cast("double")
            ).alias("jaccard"),
        )
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Training corpus minus contaminated documents (left anti join on
    the distinct contaminated train ids, which are broadcast-small)."""
    contaminated = (
        contamination_pairs(train_df, eval_df, id_col=id_col, **kwargs)
        .select(F.col("train_id").alias(id_col))
        .distinct()
    )
    return train_df.join(F.broadcast(contaminated), id_col, "left_anti")
