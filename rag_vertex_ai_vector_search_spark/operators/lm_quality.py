"""Language-model quality scoring: per-document average surprisal
under a corpus unigram model (the CCNet-style perplexity filter).

CCNet (Wenzek et al., LREC 2020) ranks web documents by LM perplexity:
low-surprisal text is fluent/common, high-surprisal is noise or
boilerplate-free rare content; training recipes keep the middle. A full
KenLM is a model dependency; the engine ships the UNIGRAM version as
real, distributed machinery (counts, smoothing, scoring) with the same
pipeline shape an n-gram model would use -- swap the probability table,
nothing else moves.

    p(w) = (count(w) + alpha) / (N + alpha * V)     (add-alpha smoothing)
    surprisal(doc) = mean_w -ln p(w)                (nats per token)

Determinism/oracle trick: summing -ln p over a document's words in
floating point is shuffle-order-dependent. Each word's surprisal is
therefore quantized to an INTEGER (floor(-ln(p) * 1e6) micronats): the
per-doc SUM is exact bigint arithmetic (order-independent), and the
final mean divides two exact integers -- bit-identical in any engine,
at a quantization error < 1e-6 nats/word, far below any filtering
threshold. The quantum is deliberately COARSE: two engines' libm ln()
may differ in the last ulp, and floor() only diverges when the product
straddles an integer boundary -- at 1e6 (vs 1e9) there are 1000x fewer
boundaries, so a 1-ulp ln() disagreement is correspondingly less
likely to flip a quantized value.

Scale shape: words explode -> shuffle-join against the count table ->
per-doc integer aggregate. The count table is vocabulary-sized; at web
scale (~1e7-1e8 rows) it stays a plain shuffled join (AQE picks the
strategy); the two model scalars (N, V) are a one-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized_text

SURPRISAL_SCALE = 1_000_000  # micronats


def unigram_counts(
    df: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """(word, n) over the normalized corpus -- the unigram model table."""
    return (
        df.select(
            F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias(
                "word"
            )
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def unigram_surprisal(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    counts: DataFrame | None = None,
) -> DataFrame:
    """(id, n_words, avg_surprisal_nats) for every document, scored
    under ``counts`` (default: the corpus itself -- self-scoring, the
    CCNet setup uses a reference-corpus model; pass one to mirror
    that)."""
    counts = counts if counts is not None else unigram_counts(df, text_col=text_col)
    totals = counts.agg(
        F.sum("n").alias("_N"), F.count(F.lit(1)).alias("_V")
    ).collect()[0]
    n_total, vocab = int(totals._N), int(totals._V)
    denom = float(n_total) + alpha * float(vocab)

    words = df.select(
        F.col(id_col),
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias(
            "word"
        ),
    )
    # Unseen words (when scoring under an external model) get count 0.
    scored = words.join(counts, "word", "left").withColumn(
        "_surprisal_micronats",
        F.floor(
            -F.log(
                (F.coalesce(F.col("n"), F.lit(0)).cast("double") + F.lit(alpha))
                / F.lit(denom)
            )
            * F.lit(float(SURPRISAL_SCALE))
        ).cast("long"),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_surprisal_micronats").alias("_s"),
        )
        .withColumn(
            "avg_surprisal_nats",
            F.col("_s").cast("double")
            / (F.lit(float(SURPRISAL_SCALE)) * F.col("n_words").cast("double")),
        )
        .drop("_s")
    )


def surprisal_buckets(
    scored: DataFrame,
    *,
    group_cols: list[str] | None = None,
    score_col: str = "avg_surprisal_nats",
    id_col: str = "doc_id",
    n_buckets: int = 3,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet's head/middle/tail split: rank documents by LM surprisal
    WITHIN each group (per language, in CCNet) and cut into
    ``n_buckets`` equal-frequency buckets -- head = most fluent,
    tail = most surprising. Training recipes sample the buckets at
    different rates (head is boilerplate-heavy, tail is noisy; middle
    is the sweet spot).

    ``ntile`` over a deterministic (score, id) order makes the cut
    reproducible and engine-portable (same ORDER BY in DuckDB ranks
    identically, so the driver gate is bit-exact). One shuffle keyed on
    the group columns; each group ranks independently, so parallelism
    is the number of groups -- at corpus scale that is languages x
    shards if a finer ``group_cols`` is passed.
    """
    from pyspark.sql import Window

    if n_buckets == len(labels):
        label_expr = F.element_at(
            F.array(*[F.lit(x) for x in labels]), F.col("bucket_idx")
        )
    else:
        label_expr = F.concat(F.lit("q"), F.col("bucket_idx").cast("string"))
    parts = group_cols or []
    from ..functions.vector import constant_partition_key

    w = (
        Window.partitionBy(*[F.col(c) for c in parts])
        if parts else Window.partitionBy(constant_partition_key(id_col))
    ).orderBy(F.col(score_col).asc(), F.col(id_col).asc())
    return (
        scored.withColumn("bucket_idx", F.ntile(n_buckets).over(w))
        .withColumn("ppl_bucket", label_expr)
    )


BOS = "<s>"  # sentence-start context for each document's first word


def _positioned_words(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, word, prev): posexplode the normalized text and attach
    each word's predecessor via a per-doc lag window (the first word's
    context is the BOS marker). The lag shuffle keys on the document --
    one task per doc's words, wide parallelism across docs."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    return (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.split(normalized_text(F.col(text_col)), " ")
            ).alias("pos", "word"),
        )
        .withColumn("prev", F.coalesce(F.lag("word").over(w), F.lit(BOS)))
    )


def _positioned_words2(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, word, prev, prev2): two lag contexts per position,
    both BOS-padded at the document start (pos 0 sees (<s>, <s>),
    pos 1 sees (<s>, w0)). One per-doc lag shuffle serves both lags."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    return (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.split(normalized_text(F.col(text_col)), " ")
            ).alias("pos", "word"),
        )
        .withColumn("prev", F.coalesce(F.lag("word", 1).over(w), F.lit(BOS)))
        .withColumn("prev2", F.coalesce(F.lag("word", 2).over(w), F.lit(BOS)))
    )


def trigram_position_counts(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(prev2, prev, word, n) over the BOS-padded position stream --
    the SINGLE sufficient statistic for the interpolated trigram
    ladder: every lower-order table (bigram, contexts, unigram, totals)
    derives from it by exact integer sums, which is what lets the
    streaming maintenance (streaming/ngram.py) keep one table and the
    scorer derive the rest bit-exactly."""
    return (
        _positioned_words2(df, id_col, text_col)
        .groupBy("prev2", "prev", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def trigram_surprisal(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1),
    counts: DataFrame | None = None,
) -> DataFrame:
    """(id, n_words, avg_surprisal_nats) under an INTERPOLATED BACKOFF
    trigram model -- the next rung of the CCNet ladder toward a real
    5-gram KenLM (whose scorer is likewise an interpolated/backoff
    n-gram mixture):

        p(w | prev2, prev) = l3 * p3 + l2 * p2 + l1 * p1
        p3 = (c(prev2, prev, w) + a) / (c(prev2, prev) + a * V)
        p2 = (c(prev, w)        + a) / (c(prev)        + a * V)
        p1 = (c(w)              + a) / (N               + a * V)

    (Jelinek-Mercer interpolation with fixed weights ``lambdas``; each
    order is add-alpha smoothed, so the mixture is a proper
    distribution and unseen trigrams back off smoothly instead of
    cliff-dropping to the floor probability.) Document starts see a
    double-BOS context.

    Same determinism contract as the unigram/bigram scorers: the
    mixture is evaluated in a FIXED left-fold order (l3*p3 + l2*p2 +
    l1*p1, mirrored textually in the SQL oracle), each p_i is a single
    IEEE division, and the per-word -ln is quantized to integer
    micronats so per-doc sums are exact bigint arithmetic.

    Scale shape: one posexplode + one per-doc lag shuffle (serving both
    lags), then count-table joins -- the trigram table (bounded by
    distinct trigrams) is the only table a bigram scorer doesn't
    already shuffle. The only driver-side values are the scalars N, V.

    ``counts``: a prebuilt (prev2, prev, word, n) trigram-position
    table (e.g. the streaming-maintained one from streaming/ngram.py).
    Every lower-order table derives from it by exact integer sums, so
    scoring under ``counts`` built from the same corpus is bit-equal
    to self-scoring; a table built from a REFERENCE corpus gives the
    CCNet setup (score web text under a clean-corpus model), with
    unseen n-grams coalescing to zero counts.
    """
    l3, l2, l1 = (float(x) for x in lambdas)
    words = _positioned_words2(df, id_col, text_col)
    tri = (
        counts if counts is not None
        else trigram_position_counts(df, id_col=id_col, text_col=text_col)
    )
    tri_counts = tri.select(
        "prev2", "prev", "word", F.col("n").cast("long").alias("n3")
    )
    tri_ctx = tri.groupBy("prev2", "prev").agg(
        F.sum("n").cast("long").alias("c3")
    )
    bi_counts = tri.groupBy("prev", "word").agg(
        F.sum("n").cast("long").alias("n2")
    )
    bi_ctx = tri.groupBy("prev").agg(F.sum("n").cast("long").alias("n1"))
    uni_counts = tri.groupBy("word").agg(F.sum("n").cast("long").alias("n0"))
    totals = tri.agg(
        F.sum("n").alias("_N"),
        F.countDistinct("word").alias("_V"),
    ).collect()[0]
    n_total, vocab = float(totals._N), float(totals._V)

    a = F.lit(alpha)
    av = F.lit(alpha) * F.lit(vocab)

    def _cnt(col: str):
        return F.coalesce(F.col(col), F.lit(0)).cast("double")

    p3 = (_cnt("n3") + a) / (_cnt("c3") + av)
    p2 = (_cnt("n2") + a) / (_cnt("n1") + av)
    p1 = (_cnt("n0") + a) / (F.lit(n_total) + av)
    mix = F.lit(l3) * p3 + F.lit(l2) * p2 + F.lit(l1) * p1

    # Score each DISTINCT triple of the SCORED corpus once (the five
    # count joins run table-vs-table, bounded by distinct n-grams --
    # left joins + coalesce give unseen orders their backoff counts),
    # then join the positions stream ONCE on the triple: one
    # position-level shuffle instead of five. Per-triple values are
    # identical to per-position computation, so the integer sums (and
    # the oracle) are unchanged.
    triple_scores = (
        words.select("prev2", "prev", "word").distinct()
        .join(tri_counts, ["prev2", "prev", "word"], "left")
        .join(tri_ctx, ["prev2", "prev"], "left")
        .join(bi_counts, ["prev", "word"], "left")
        .join(bi_ctx, ["prev"], "left")
        .join(uni_counts, ["word"], "left")
        .withColumn(
            "_surprisal_micronats",
            F.floor(-F.log(mix) * F.lit(float(SURPRISAL_SCALE))).cast("long"),
        )
        .select("prev2", "prev", "word", "_surprisal_micronats")
    )
    scored = words.join(triple_scores, ["prev2", "prev", "word"], "left")
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_surprisal_micronats").alias("_s"),
        )
        .withColumn(
            "avg_surprisal_nats",
            F.col("_s").cast("double")
            / (F.lit(float(SURPRISAL_SCALE)) * F.col("n_words").cast("double")),
        )
        .drop("_s")
    )


def bigram_surprisal(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """(id, n_words, avg_surprisal_nats) under a corpus BIGRAM model --
    one Markov order up from ``unigram_surprisal``, the direction a
    KenLM-backed CCNet filter takes (higher-order context separates
    fluent text from shuffled-word noise that a unigram model scores
    identically).

        p(w | prev) = (c(prev, w) + alpha) / (c(prev) + alpha * V)

    with add-alpha smoothing over the unigram vocabulary V and a BOS
    context for each document's first word. Same determinism contract
    as the unigram scorer: per-word surprisal quantizes to integer
    micronats, per-doc sums are exact bigint arithmetic, bit-identical
    in DuckDB.

    Scale shape: posexplode -> per-doc lag window (shuffle keyed on
    doc) -> shuffle-join against the bigram count table (rows bounded
    by distinct bigrams, AQE picks the join strategy) -> per-doc
    integer aggregate. The only driver-side value is the scalar V.
    """
    words = _positioned_words(df, id_col, text_col)
    bigram_counts = words.groupBy("prev", "word").agg(
        F.count(F.lit(1)).alias("n2")
    )
    context_counts = words.groupBy("prev").agg(F.count(F.lit(1)).alias("n1"))
    vocab = words.select("word").distinct().count()

    # Score each distinct (prev, word) pair once at bigram-table
    # cardinality, then ONE position-level join back (the trigram
    # scorer's shape) -- identical per-pair values, fewer corpus-scale
    # shuffles on real text where distinct bigrams << positions.
    pair_scores = (
        bigram_counts.join(context_counts, "prev", "left")
        .withColumn(
            "_surprisal_micronats",
            F.floor(
                -F.log(
                    (
                        F.coalesce(F.col("n2"), F.lit(0)).cast("double")
                        + F.lit(alpha)
                    )
                    / (
                        F.coalesce(F.col("n1"), F.lit(0)).cast("double")
                        + F.lit(alpha) * F.lit(float(vocab))
                    )
                )
                * F.lit(float(SURPRISAL_SCALE))
            ).cast("long"),
        )
        .select("prev", "word", "_surprisal_micronats")
    )
    scored = words.join(pair_scores, ["prev", "word"], "left")
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_surprisal_micronats").alias("_s"),
        )
        .withColumn(
            "avg_surprisal_nats",
            F.col("_s").cast("double")
            / (F.lit(float(SURPRISAL_SCALE)) * F.col("n_words").cast("double")),
        )
        .drop("_s")
    )


def kneser_ney_bigram_surprisal(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
    alpha: float = 0.5,
) -> DataFrame:
    """(id, n_words, avg_surprisal_nats) under an INTERPOLATED
    KNESER-NEY bigram model -- the standard n-gram smoothing (Kneser &
    Ney 1995; Chen & Goodman 1999's interpolated variant), and what
    KenLM itself implements:

        p_KN(w | prev) = max(c(prev,w) - d, 0) / c(prev)
                         + (d * N1+(prev,.) / c(prev)) * p_cont(w)
        p_cont(w)      = (N1+(.,w) + a) / (N1+(.,.) + a * V)

    The continuation probability asks "how many distinct contexts does
    w complete", not "how often does w occur" -- the fix for the
    'san francisco' pathology where add-alpha overrates 'francisco' in
    new contexts. p_cont gets add-alpha smoothing so wholly-unseen
    words keep a nonzero floor (and the distribution stays proper);
    unseen contexts (possible when scoring under a reference-corpus
    model) fall back to p_cont alone.

    All five statistics (c(prev,w), c(prev), N1+(prev,.), N1+(.,w),
    N1+(.,.)) are exact integers off the bigram table; the probability
    is evaluated in a FIXED operation order mirrored textually by the
    SQL oracle, then quantized to integer micronats -- same
    determinism contract as every scorer in this module. Scale shape
    identical to bigram_surprisal: per-DISTINCT-pair scoring at
    bigram-table cardinality, one position-level join back.
    """
    d = float(discount)
    words = _positioned_words(df, id_col, text_col)
    bg = words.groupBy("prev", "word").agg(
        F.count(F.lit(1)).cast("long").alias("n2")
    )
    ctx = words.groupBy("prev").agg(F.count(F.lit(1)).cast("long").alias("n1"))
    # continuation statistics: distinct-type counts off the bigram table
    t_prev = bg.groupBy("prev").agg(
        F.count(F.lit(1)).cast("long").alias("tprev")   # N1+(prev, .)
    )
    n_cw = bg.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("ncw")     # N1+(., w)
    )
    scalars = bg.agg(
        F.count(F.lit(1)).alias("_types"),
    ).collect()[0]
    n_types = float(scalars._types)                      # N1+(., .)
    vocab = float(words.select("word").distinct().count())

    pcont = (
        (F.coalesce(F.col("ncw"), F.lit(0)).cast("double") + F.lit(alpha))
        / (F.lit(n_types) + F.lit(alpha) * F.lit(vocab))
    )
    n1d = F.coalesce(F.col("n1"), F.lit(0)).cast("double")
    p_kn = F.when(
        F.coalesce(F.col("n1"), F.lit(0)) > 0,
        F.greatest(
            F.coalesce(F.col("n2"), F.lit(0)).cast("double") - F.lit(d),
            F.lit(0.0),
        ) / n1d
        + (
            (F.lit(d) * F.coalesce(F.col("tprev"), F.lit(0)).cast("double"))
            / n1d
        ) * pcont,
    ).otherwise(pcont)

    pair_scores = (
        bg.join(ctx, "prev", "left")
        .join(t_prev, "prev", "left")
        .join(n_cw, "word", "left")
        .withColumn(
            "_surprisal_micronats",
            F.floor(-F.log(p_kn) * F.lit(float(SURPRISAL_SCALE))).cast(
                "long"
            ),
        )
        .select("prev", "word", "_surprisal_micronats")
    )
    scored = words.join(pair_scores, ["prev", "word"], "left")
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_surprisal_micronats").alias("_s"),
        )
        .withColumn(
            "avg_surprisal_nats",
            F.col("_s").cast("double")
            / (F.lit(float(SURPRISAL_SCALE)) * F.col("n_words").cast("double")),
        )
        .drop("_s")
    )
