"""Sequence packing: assign documents to fixed token-budget training
sequences (the concat-and-chunk batching used by LLM trainers).

Training consumes fixed-length context windows; feeding one short doc
per window wastes most of it. The standard fix is to concatenate docs
in a deterministic order and cut every ``budget`` tokens: a document's
sequence is determined by the running token offset where it starts.
This is a pure window computation --

    start     = cumsum(tokens) - tokens        (over the pack order)
    seq_id    = floor(start / budget)
    seq_offset= start - seq_id * budget

-- deterministic, shuffle-bounded, and SQL-expressible (so the driver
gate gets a bit-exact DuckDB oracle for the whole assignment).

Scale shape: a single global cumsum would funnel 100 TB through one
window partition. Packing is therefore done WITHIN groups -- by an
explicit ``group_col`` (e.g. lang or split: real pipelines pack within
a shard anyway so readers stream one file each), or by a deterministic
hash shard (``n_shards``) when no natural group exists. Each group's
window is an independent partition of bounded size; sequence ids are
namespaced by group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import base_hash_fn


def pack_sequences(
    df: DataFrame,
    *,
    token_col: str,
    budget: int = 2048,
    id_col: str = "doc_id",
    group_col: str | None = None,
    n_shards: int = 64,
    salt: str = "pack1",
    base_hash: str = "sha60",
) -> DataFrame:
    """Append (pack_group, seq_id, seq_offset) to every row.

    Rows pack in ``id_col`` order within their group; ``seq_id`` is the
    training sequence the row STARTS in, ``seq_offset`` its token
    offset there (a row may spill into the next sequence -- trainers
    split at the boundary; the assignment of starts is what must be
    deterministic). ``group_col=None`` shards by
    ``H(salt||id) mod n_shards`` so the window never sees more than
    one shard's rows.
    """
    if group_col is not None:
        grouped = df.withColumn("pack_group", F.col(group_col).cast("string"))
    else:
        hash_fn = base_hash_fn(base_hash)
        grouped = df.withColumn(
            "pack_group",
            F.pmod(
                hash_fn(
                    F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))
                ),
                F.lit(n_shards),
            ).cast("string"),
        )
    w = Window.partitionBy("pack_group").orderBy(id_col)
    start = (F.sum(token_col).over(w) - F.col(token_col)).cast("long")
    seq_id = F.floor(start / F.lit(budget)).cast("long")
    return (
        grouped.withColumn("seq_id", seq_id)
        .withColumn(
            "seq_offset", (start - F.col("seq_id") * F.lit(budget)).cast("long")
        )
    )


def concat_sequences(
    packed: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """Materialize one row per training sequence: documents of a
    (pack_group, seq_id) concatenated in ``id_col`` order.

    Ordering inside the aggregate is made deterministic by sorting the
    collected (id, text) structs (``collect_list`` order is not
    guaranteed across retries/partitions; ``array_sort`` on the struct
    orders by id first). One shuffle, shared key with the packing
    window."""
    return (
        packed.groupBy("pack_group", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(id_col, text_col))
                    ),
                    lambda s: s[text_col],
                ),
                sep,
            ).alias("seq_text"),
        )
    )


def packing_efficiency(
    packed: DataFrame, *, token_col: str, budget: int = 2048
) -> DataFrame:
    """Per-group fill metric: tokens per allocated sequence slot
    (n_tokens / (n_seqs * budget)) -- the waste monitor for the packing
    policy. Tiny aggregate, driver-safe.

    ``n_seqs`` counts slots from CONSUMED tokens (ceil(n_tokens /
    budget), integer arithmetic): docs concatenate contiguously, so the
    group's stream occupies exactly that many sequences. Counting
    ``max(seq_id) + 1`` (the sequence the last doc *starts* in) under-
    counts when the last doc spills across the boundary, which let
    fill_fraction exceed 1.0."""
    return (
        packed.groupBy("pack_group")
        .agg(F.sum(token_col).cast("long").alias("n_tokens"))
        .withColumn(
            "n_seqs",
            F.floor(
                (F.col("n_tokens") + F.lit(budget - 1)) / F.lit(budget)
            ).cast("long"),
        )
        .withColumn(
            "fill_fraction",
            F.col("n_tokens") / (F.col("n_seqs") * F.lit(budget)),
        )
    )
