"""Tokenizer corpus-prep: the aggregate statistics a tokenizer build
(BPE/WordPiece) extracts from a training corpus before any model runs.

Two operators, both classic first-steps of tokenizer training:

- ``vocab_coverage_report``: top-K words by frequency with the running
  corpus-coverage fraction -- the curve that answers "how big must the
  vocabulary be to cover X% of tokens" (vocab-size budgeting).
- ``bpe_merge_pairs``: adjacent-character-pair frequencies inside
  words, weighted by word frequency -- exactly the statistic BPE's
  first merge iteration maximizes (Sennrich et al. 2016). One
  iteration is enough for the engine's job (the corpus-side count);
  the greedy merge loop itself is vocabulary-sized driver work.

Scale shape: both reduce to word-count tables first (one shuffle with
map-side combine over ~corpus tokens), then operate on the
vocabulary-sized side (bounded by distinct words, not corpus rows).
The top-K cut is orderBy+limit -> TakeOrderedAndProject (distributed
partial top-K, tiny driver merge), and the rank/cumsum windows run
over only the K survivors under a constant partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalized_text
from ..functions.vector import constant_partition_key


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(
            F.explode(
                F.split(normalized_text(F.col(text_col)), " ")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def vocab_coverage_report(
    df: DataFrame, *, text_col: str = "text", top_k: int = 100
) -> DataFrame:
    """(rank, word, n, cum_fraction) for the ``top_k`` most frequent
    words; ``cum_fraction`` is the running fraction of ALL corpus
    tokens covered by ranks 1..rank. Deterministic (n desc, word asc)
    ordering makes ranks and fractions engine-portable. The corpus
    total rides along as a broadcast one-row aggregate -- no driver
    collect."""
    return vocab_coverage_from_counts(_word_counts(df, text_col), top_k=top_k)


def vocab_coverage_from_counts(counts: DataFrame, *, top_k: int = 100) -> DataFrame:
    """Coverage report over a prebuilt (word, n) table -- the shared
    tail of the batch path and the streaming path
    (streaming/vocab.py's incrementally-maintained counts)."""
    total = counts.agg(F.sum("n").cast("long").alias("_total"))
    top = (
        counts.orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(top_k)
        .crossJoin(F.broadcast(total))
    )
    w = Window.partitionBy(constant_partition_key("word")).orderBy(
        F.col("n").desc(), F.col("word").asc()
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum_fraction",
            F.sum("n").over(run).cast("double") / F.col("_total").cast("double"),
        )
        .select("rank", "word", F.col("n").cast("long").alias("n"),
                "cum_fraction")
    )


def bpe_merge_pairs(
    df: DataFrame, *, text_col: str = "text", top_k: int = 100
) -> DataFrame:
    """(rank, pair, n_occurrences) for the ``top_k`` most frequent
    adjacent character pairs inside words, weighted by word frequency
    -- BPE's first-iteration merge candidates. Pair enumeration runs
    on the VOCABULARY table (distinct words), so the explode is
    bounded by vocab size x word length, not corpus tokens."""
    return bpe_merge_pairs_from_counts(
        _word_counts(df, text_col), top_k=top_k
    )


def bpe_merge_pairs_from_counts(
    counts: DataFrame, *, top_k: int = 100
) -> DataFrame:
    """Pair statistics over a prebuilt (word, n) table (shared with the
    streaming count maintenance)."""
    pairs = counts.select(
        F.explode(
            F.when(
                F.length("word") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.col("word").substr(i, F.lit(2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair"),
        F.col("n"),
    )
    agg = pairs.groupBy("pair").agg(
        F.sum("n").cast("long").alias("n_occurrences")
    )
    w = Window.partitionBy(constant_partition_key("pair")).orderBy(
        F.col("n_occurrences").desc(), F.col("pair").asc()
    )
    return (
        agg.orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "pair", "n_occurrences")
    )


# --------------------------------------------------------------------------
# Iterative BPE training (Sennrich et al. 2016, Algorithm 1)
# --------------------------------------------------------------------------

_PAIR_SEP = "\x01"  # joins (left, right) into one pair key


def _merge_fold(toks_col, left, right):
    """Apply ONE merge (left, right) -> left+right to a space-joined
    symbol string, greedy left-to-right non-overlapping -- the exact
    scan semantics of the reference BPE implementation, expressed as a
    sequential fold: seed with the first symbol, then for each next
    symbol either merge it into the accumulator's LAST token (when
    last == left and s == right) or append. A just-merged token equals
    left+right and can no longer match as ``left``, which reproduces
    the i += 2 skip of the scanning loop.

    The accumulator is a STRING (not an array) so the identical
    lambda runs as DuckDB ``list_reduce`` in the oracle -- same
    algorithm, same types, both engines.
    """
    arr = F.split(toks_col, " ")
    merged = F.concat(F.lit(left), F.lit(right))

    def step(acc, s):
        accarr = F.split(acc, " ")
        last = F.element_at(accarr, -1)
        stripped = F.array_join(
            F.slice(accarr, 1, F.size(accarr) - 1), " "
        )
        head = F.when(
            F.size(accarr) == 1, F.lit("")
        ).otherwise(F.concat(stripped, F.lit(" ")))
        return F.when(
            (last == F.lit(left)) & (s == F.lit(right)),
            F.concat(head, merged),
        ).otherwise(F.concat(acc, F.lit(" "), s))

    return F.aggregate(
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.element_at(arr, 1),
        step,
    )


def train_bpe(
    df: DataFrame | None,
    *,
    text_col: str = "text",
    n_merges: int = 8,
    checkpoint_every: int = 4,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus: the full greedy
    loop, not just the first iteration's statistics. Returns
    ``(merge_rank, left, right, merged, n_occurrences)`` -- the merge
    list a tokenizer ships.

    ``counts`` (a prebuilt (word, n) table) replaces the corpus scan
    -- the same seam vocab_coverage_from_counts exposes, so the
    streaming-maintained vocabulary (streaming/vocab.py) feeds BPE
    training without re-reading documents.

    Scale shape per iteration: pair counting and the merge rewrite run
    on the VOCABULARY table (distinct words x word length -- bounded,
    never corpus-sized), and the only driver traffic is ONE row (the
    argmax pair). ``checkpoint_every`` localCheckpoints the vocabulary
    so iteration i+1's scan doesn't replay i accumulated rewrites --
    the same lineage-truncation policy as the connected-components
    loop. Deterministic: ties break (count desc, pair asc) like
    bpe_merge_pairs.
    """
    base = counts if counts is not None else _word_counts(df, text_col)
    vocab = base.select(
        "word",
        F.array_join(F.split(F.col("word"), ""), " ").alias("toks"),
        F.col("n").cast("long").alias("n"),
    ).localCheckpoint(eager=True)

    merges = []
    for rank in range(1, n_merges + 1):
        arr = F.split(F.col("toks"), " ")
        pairs = vocab.select(
            F.explode(
                F.when(
                    F.size(arr) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(arr) - 1),
                        lambda i: F.concat(
                            F.element_at(arr, i),
                            F.lit(_PAIR_SEP),
                            F.element_at(arr, i + 1),
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("pair"),
            "n",
        )
        best = (
            pairs.groupBy("pair")
            .agg(F.sum("n").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not best:
            raise ValueError(
                f"BPE pairs exhausted after {rank - 1} merges "
                f"(requested {n_merges}): every word is one symbol"
            )
        left, right = best[0]["pair"].split(_PAIR_SEP)
        merges.append((rank, left, right, left + right, best[0]["cnt"]))
        vocab = vocab.withColumn(
            "toks", _merge_fold(F.col("toks"), left, right)
        )
        if rank % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)

    spark = (df if df is not None else base).sparkSession
    return spark.createDataFrame(
        merges,
        "merge_rank long, left string, right string, merged string, "
        "n_occurrences long",
    )


def apply_bpe_to_words(
    words: DataFrame,
    merges,
    *,
    word_col: str = "word",
    method: str = "fold",
) -> DataFrame:
    """Apply an ORDERED merge list to each word: the encode side of
    BPE (what a tokenizer does at corpus-processing time with a
    published merges.txt). Returns the input plus ``toks`` -- the
    word's final space-joined symbol sequence.

    ``merges``: [(left, right), ...] in training order (driver-held;
    a production merges.txt is ~32k pairs, a few hundred KiB).

    ``method="fold"``: one chained JVM fold per merge -- bit-exact
    against the training rewrite (and the SQL oracle) but the
    expression tree grows with len(merges); right for gates and short
    merge lists. ``method="udf"``: one Arrow-batched pandas UDF
    applying all merges per word with the standard scan loop -- the
    production path for real merge lists (per-word cost ~word_len x
    matching merges, independent of expression-tree limits). Both
    paths produce IDENTICAL results (tests/test_tokenizer.py).
    """
    if method == "fold":
        toks = F.array_join(F.split(F.col(word_col), ""), " ")
        out = words.withColumn("toks", toks)
        for left, right in merges:
            out = out.withColumn(
                "toks", _merge_fold(F.col("toks"), left, right)
            )
        return out

    if method != "udf":
        raise ValueError(f"method must be 'fold' or 'udf', got {method!r}")

    from pyspark.sql import types as T

    merge_list = list(merges)

    # no pd.Series annotations: pandas is imported locally, so string
    # type hints would not resolve for pandas_udf's inference
    @F.pandas_udf(T.StringType())
    def _apply(col):
        def encode(w: str) -> str:
            syms = list(w)
            for left, right in merge_list:
                i = 0
                out = []
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return " ".join(syms)

        return col.map(encode)

    return words.withColumn("toks", _apply(F.col(word_col)))


def bpe_tokenize(
    df: DataFrame,
    merges,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "fold",
) -> DataFrame:
    """Tokenize a corpus with a trained merge list: per-document
    ``(id, n_words, n_tokens, tokens)`` where ``tokens`` is the
    space-joined BPE symbol stream in word order.

    Scale shape (the per-DISTINCT-word rule): merges apply once per
    VOCABULARY entry, then one join maps positions back -- the
    encode work is bounded by distinct words x word length however
    large the corpus, and the join shuffles corpus positions once.
    """
    pos = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(normalized_text(F.col(text_col)), " ")
        ).alias("_pos", "word"),
    )
    vocab = apply_bpe_to_words(
        pos.select("word").distinct(), merges, method=method
    )
    joined = pos.join(vocab, "word")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_pos"), F.col("toks")))
                    ),
                    lambda s: s.getField("toks"),
                ),
                " ",
            ).alias("tokens"),
        )
        .withColumn(
            "n_tokens",
            F.size(F.split(F.col("tokens"), " ")).cast("long"),
        )
        .select(id_col, "n_words", "n_tokens", "tokens")
    )
