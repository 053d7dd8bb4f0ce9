"""DSIR-style data selection: importance resampling over hashed
n-gram features (Xie et al., NeurIPS 2023, "Data Selection for
Language Models via Importance Resampling").

Given a small TARGET corpus (the distribution you want -- Wikipedia,
curated text, one language) and a large RAW corpus, DSIR scores every
raw document by the log importance ratio under bag-of-hashed-ngram
models

    log w(doc) = sum_g [ ln p_target(bucket(g)) - ln p_raw(bucket(g)) ]

(g ranges over the document's unigrams + bigrams, hashed into
``n_buckets`` buckets; each bucket distribution is add-alpha smoothed)
and then samples the training set with probability proportional to
w -- implemented here as deterministic Gumbel-top-k (hash-derived
uniforms), the standard weighted-sampling-without-replacement trick.

Determinism/oracle contract (same as operators/lm_quality.py): each
DISTINCT bucket's log ratio is quantized to integer micronats
(floor(x * 1e6)), so per-doc sums are exact bigint arithmetic --
order-independent and bit-identical in DuckDB. Buckets are keyed by
the SQL-mirrorable sha60 hash modulo ``n_buckets`` (sha60 is
non-negative, so Spark pmod == SQL %).

Scale shape: gram enumeration is NARROW (split + transform + explode,
rows ~ 2x corpus tokens); the two model tables aggregate to AT MOST
``n_buckets`` rows each (map-side combine collapses the heavy
buckets), so the per-bucket score table is broadcast-sized BY
CONSTRUCTION regardless of corpus size; one join back on the bucket id
and one per-doc integer aggregate. The only driver-side values are the
two scalar gram totals. Selection is orderBy().limit() --
TakeOrderedAndProject, a true distributed top-k, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import base_hash_fn, let_col, normalized_text
from ..sources.tables import fan_out

LOG_SCALE = 1_000_000  # micronats (see lm_quality.SURPRISAL_SCALE)


def _gram_buckets(
    df: DataFrame, id_col, text_col: str, n_buckets: int, base_hash: str
) -> DataFrame:
    """(id?, bucket) -- one row per unigram AND bigram occurrence of the
    normalized text, hashed into ``n_buckets`` buckets. ``id_col=None``
    drops the id (model building needs only the buckets)."""
    hash_fn = base_hash_fn(base_hash)
    # let_col-bound (functions/text.py): an inlined word-array
    # expression is re-evaluated per bigram inside the lambda.
    grams = let_col(
        F.split(normalized_text(F.col(text_col)), " "),
        lambda ws: F.concat(
            ws,
            F.when(
                F.size(ws) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(ws) - 1),
                    lambda i: F.array_join(F.slice(ws, i, 2), " "),
                ),
            ).otherwise(F.array().cast("array<string>")),
        ),
    )
    cols = ([F.col(id_col)] if id_col else []) + [
        F.explode(grams).alias("_gram")
    ]
    out = fan_out(df).select(*cols)
    return out.withColumn(
        "bucket", F.pmod(hash_fn(F.col("_gram")), F.lit(n_buckets))
    ).drop("_gram")


def hashed_gram_bucket_counts(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_buckets: int = 8192,
    base_hash: str = "sha60",
) -> DataFrame:
    """(bucket, n) -- the hashed n-gram bag model of a corpus. At most
    ``n_buckets`` rows whatever the corpus size; this is the table a
    streaming maintenance job would keep per epoch."""
    return (
        _gram_buckets(df, None, text_col, n_buckets, base_hash)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def dsir_log_importance(
    df: DataFrame,
    target_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str | None = None,
    n_buckets: int = 8192,
    alpha: float = 0.5,
    base_hash: str = "sha60",
    raw_counts: DataFrame | None = None,
    target_counts: DataFrame | None = None,
) -> DataFrame:
    """(id, n_grams, log_weight_micronats, avg_log_weight_nats) for
    every document of ``df``: the DSIR log importance ratio of the
    target model over the raw model, summed over the document's hashed
    unigram+bigram occurrences.

    Positive = the document looks more like the target corpus than
    like the raw corpus average; selection keeps the high end.
    ``raw_counts`` / ``target_counts`` accept prebuilt (bucket, n)
    tables (default: built from ``df`` / ``target_df``).
    """
    tcol = target_text_col or text_col
    # Self-built model tables are cached: they are <= n_buckets rows
    # (trivial memory) but each sits on a full gram-enumeration scan,
    # and they are consumed twice -- once by the scalar-total collect
    # below and once by the scoring join. Without the cache the corpus
    # scan runs four times instead of twice.
    if raw_counts is None:
        raw_counts = hashed_gram_bucket_counts(
            df, text_col=text_col, n_buckets=n_buckets, base_hash=base_hash
        ).cache()
    if target_counts is None:
        target_counts = hashed_gram_bucket_counts(
            target_df, text_col=tcol, n_buckets=n_buckets, base_hash=base_hash
        ).cache()
    n_raw = int(raw_counts.agg(F.sum("n")).collect()[0][0] or 0)
    n_tgt = int(target_counts.agg(F.sum("n")).collect()[0][0] or 0)
    denom_r = float(n_raw) + alpha * float(n_buckets)
    denom_t = float(n_tgt) + alpha * float(n_buckets)

    grams = _gram_buckets(df, id_col, text_col, n_buckets, base_hash)
    # Score the WHOLE bucket domain 0..B-1 once (spark.range -- no
    # corpus scan; <= n_buckets rows, broadcast-sized by construction),
    # then one join back on the bucket id. Unobserved buckets get a
    # score no gram ever joins -- harmless, and it keeps the corpus
    # scan count at one. ln(pt) - ln(pr) is mirrored TEXTUALLY in the
    # SQL oracle; floor quantization makes the per-doc sum exact
    # bigint arithmetic.
    a = F.lit(alpha)
    p_t = (F.coalesce(F.col("_nt"), F.lit(0)).cast("double") + a) / F.lit(
        denom_t
    )
    p_r = (F.coalesce(F.col("_nr"), F.lit(0)).cast("double") + a) / F.lit(
        denom_r
    )
    domain = df.sparkSession.range(n_buckets).select(
        F.col("id").cast("long").alias("bucket")
    )
    bucket_scores = (
        domain
        .join(target_counts.select("bucket", F.col("n").alias("_nt")),
              "bucket", "left")
        .join(raw_counts.select("bucket", F.col("n").alias("_nr")),
              "bucket", "left")
        .withColumn(
            "_lw_micronats",
            F.floor((F.log(p_t) - F.log(p_r)) * F.lit(float(LOG_SCALE)))
            .cast("long"),
        )
        .select("bucket", "_lw_micronats")
    )
    scored = grams.join(bucket_scores, "bucket", "left")
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("_lw_micronats").alias("log_weight_micronats"),
        )
        .withColumn(
            "avg_log_weight_nats",
            F.col("log_weight_micronats").cast("double")
            / (F.lit(float(LOG_SCALE)) * F.col("n_grams").cast("double")),
        )
    )


def dsir_gumbel_select(
    scored: DataFrame,
    n_keep: int,
    *,
    id_col: str = "doc_id",
    weight_col: str = "log_weight_micronats",
    salt: str = "dsir",
    base_hash: str = "sha60",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of ``n_keep`` documents
    with probability proportional to exp(log_weight): the Gumbel-top-k
    trick (key = log_weight + Gumbel noise; the k largest keys are an
    exact sample from the softmax). Noise is DETERMINISTIC -- a
    hash-derived uniform u = (sha60(salt||id) + 1) / (2^60 + 1) fed
    through -ln(-ln(u)) -- so the selection is reproducible, re-rollable
    by ``salt``, and SQL-mirrorable. The key is quantized to integer
    micronats and tie-broken on id, making the order (and therefore the
    selected SET) engine-portable; orderBy().limit() plans as
    TakeOrderedAndProject, a true distributed top-k.

    Adds ``gumbel_key_micronats``; returns only the selected rows.
    """
    hash_fn = base_hash_fn(base_hash)
    u = (
        (
            hash_fn(F.concat(F.lit(salt), F.lit(":"),
                             F.col(id_col).cast("string")))
            .cast("double")
            + F.lit(1.0)
        )
        / F.lit(float(2**60) + 1.0)
    )
    gumbel = -F.log(-F.log(u))
    key = (
        F.col(weight_col).cast("double")
        + gumbel * F.lit(float(LOG_SCALE))
    )
    out = scored.withColumn(
        "gumbel_key_micronats", F.floor(key).cast("long")
    )
    return (
        out.orderBy(
            F.col("gumbel_key_micronats").desc(), F.col(id_col).asc()
        )
        .limit(n_keep)
    )
