"""Document chunking: overlapping token windows for embedding ingest.

The reference embeds whole files and rejects anything over
MAX_TOKENS_PER_TEXT=2042 (common/utils/embeddings.py:70-90,
common/config.py:57); a production corpus instead CHUNKS long documents
into overlapping windows and embeds each chunk. This operator is that
step, expressed entirely with built-in array expressions (split /
sequence / slice / posexplode) so it runs inside whole-stage codegen:

- narrow transformation, NO shuffle -- chunking 100 TB is exactly one
  scan, and the explode fans rows out within each task;
- window starts are `sequence(1, max(n_words - overlap, 1), step)`
  with step = chunk_tokens - overlap, which provably covers every word
  (last start s satisfies s + chunk_tokens - 1 >= n) while emitting no
  fully-redundant tail window;
- deterministic output (doc_id, chunk_index) is a stable key for
  downstream embedding upsert (operators/upsert.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized_text, split_sentences, whitespace_token_count


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Explode each document into overlapping whitespace-token windows.

    Returns (doc_id, chunk_index, chunk_text, n_tokens); chunk_index is
    0-based and consecutive; every word of the document appears in at
    least one chunk; consecutive chunks share ``overlap`` words. A
    document shorter than one window yields exactly one chunk.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    words = F.split(normalized_text(text_col), " ")
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(words) - F.lit(overlap), F.lit(1)),
        F.lit(step),
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        words.alias("_w"),
        starts.alias("_starts"),
    )
    ex = base.select(
        "doc_id",
        "_w",
        F.posexplode("_starts").alias("_pos", "_start"),
    )
    window = F.slice("_w", F.col("_start"), chunk_tokens)
    return ex.select(
        "doc_id",
        F.col("_pos").cast("long").alias("chunk_index"),
        F.array_join(window, " ").alias("chunk_text"),
        F.size(window).cast("long").alias("n_tokens"),
    )


def chunk_by_sentences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    budget_tokens: int = 64,
) -> DataFrame:
    """Sentence-aligned chunking: split each document into sentences
    (terminators kept attached), then pack CONSECUTIVE sentences into
    chunks by running token offset -- a sentence goes to chunk
    ``floor(start_offset / budget)``, so chunks never split a sentence
    and overflow past the budget is bounded by one sentence (the
    concat-and-chunk assignment ``pack_sequences`` uses, applied at
    sentence granularity within a document).

    Embedding-ingest prefers this over fixed token windows when
    sentence boundaries matter (retrieval snippets, QA passages).
    Returns (doc_id, chunk_index, chunk_text, n_sentences, n_tokens).

    Scale shape: narrow split + posexplode; one per-doc window for the
    running offset (shuffle keyed on the document); one doc+chunk
    aggregate with ordered reassembly on the same shuffle. A one-
    sentence 10k-token document still fits one task -- same bound as
    every per-doc operator here.
    """
    from pyspark.sql import Window

    sent = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(split_sentences(F.col(text_col))).alias(
            "_pos", "_sent"
        ),
    ).withColumn("_ntok", whitespace_token_count(F.col("_sent")))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("_pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = sent.withColumn(
        "_off", F.coalesce(F.sum("_ntok").over(w), F.lit(0))
    ).withColumn(
        "chunk_index",
        F.floor(F.col("_off") / F.lit(budget_tokens)).cast("long"),
    )
    return (
        packed.groupBy("doc_id", "chunk_index")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("_pos"), F.col("_sent"))
                        )
                    ),
                    lambda x: x["_sent"],
                ),
                " ",
            ).alias("chunk_text"),
            F.count(F.lit(1)).cast("long").alias("n_sentences"),
            F.sum("_ntok").cast("long").alias("n_tokens"),
        )
    )
