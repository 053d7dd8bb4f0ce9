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

from ..functions.text import normalized_text


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
