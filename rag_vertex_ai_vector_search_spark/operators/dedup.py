"""Deduplication suite for large-scale training-data pipelines.

Five strategies over a document table, each picked for a different
cost/recall point at 100 TB:

- exact            -- sha256 fingerprint group-by; one shuffle on the
                      hash, map-side combine does most of the work.
- minhash + LSH    -- shingle -> MinHash signature -> band buckets ->
                      equi-join on (band, hash). The pair generation is
                      an equi-join, NOT a cross join, so cost tracks the
                      number of colliding pairs; candidates are verified
                      with exact Jaccard on the shingle sets.
- simhash          -- 64-bit signature; near-dup = Hamming <= t. Banding
                      the 64 bits into 4 x 16-bit chunks guarantees any
                      pair with Hamming <= 3 shares a chunk (pigeonhole),
                      again turning search into an equi-join.
- n-gram Jaccard   -- exact Jaccard over distinct-word sets within
                      cheap blocking keys (language + length bucket);
                      fully SQL-expressible, the oracle-checkable variant.
- embedding cosine -- near-dup by semantic similarity over the
                      embedding column, blocked to keep the join sparse.

All emit pairs as (id_a, id_b) with id_a < id_b, plus the evidence
column (jaccard / hamming / cosine), so downstream "keep one per
cluster" is a connected-components or min-id group-by away.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    base_hash_fn,
    doc_fingerprint,
    normalized_text,
    word_shingles,
)
from ..functions.hashing import (
    hamming_distance64,
    minhash_signature_udf,
    simhash_from_hashes_udf,
    simhash_udf,
)
from ..functions.vector import dot_product, l2_norm
from ..sources.tables import fan_out


def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep one row per exact (normalized) text: min id wins.

    Returns (fingerprint, keep_id, n_dups). Group-by on the hash gets a
    map-side partial aggregate, so the shuffle carries one row per
    distinct fingerprint per partition -- at 100 TB this is the cheapest
    possible exact dedup.
    """
    return (
        df.select(doc_fingerprint(text_col).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def duplicate_clusters(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Only the fingerprints that actually collide (n_dups >= 2)."""
    return dedup_exact(df, id_col, text_col).filter(F.col("n_dups") >= 2)


def minhash_with_sig(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    shingle_words: int = 3,
    num_hashes: int = 64,
    base_hash: str = "sha60",
) -> DataFrame:
    """(id, _hashes, _sig) -- the shared signature stage of
    minhash_candidate_pairs AND minhash_banded_signatures. Consumers
    that need both (the streaming near-dup batch body matches against
    prior state AND self-pairs within the batch) compute this ONCE,
    checkpoint it, and pass it to both via their ``with_sig`` seam --
    the signature UDF and the shingle pass are the per-batch CPU cost,
    and they used to run twice per epoch (r17)."""
    sig_udf = minhash_signature_udf(num_hashes)
    hash_fn = base_hash_fn(base_hash)
    # A single parquet file arrives as one input partition; fan the
    # CPU-heavy signature UDF out to all cores before computing it.
    return fan_out(df).select(
        F.col(id_col),
        # base hash JVM-side: Arrow ships int64 arrays, not shingle
        # strings; Jaccard over distinct hashes == Jaccard over
        # shingles up to 60/64-bit collisions.
        F.array_distinct(
            F.transform(
                word_shingles(text_col, shingle_words),
                lambda s: hash_fn(s),
            )
        ).alias("_hashes"),
    ).withColumn("_sig", sig_udf("_hashes"))


def _guard_sig_width(sig: Column, num_hashes: int) -> Column:
    """Loud consistency guard on the ``with_sig`` seam (r18, ADVICE
    r17): a supplied frame built with a different ``num_hashes`` would
    otherwise fail SILENTLY -- ``F.slice`` past the signature length
    returns empty arrays, so every upper band collides on the empty
    key (wrong candidates plus a quadratic hot-bucket self-join). One
    integer compare per row; internal builds skip it."""
    return F.when(F.size(sig) == num_hashes, sig).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "with_sig frame was built with num_hashes="
                ),
                F.size(sig).cast("string"),
                F.lit(f", consumer expects {num_hashes}"),
            )
        )
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    shingle_words: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    verify: bool = True,
    max_bucket_df: int | None = 64,
    base_hash: str = "sha60",
    with_sig: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with exact-Jaccard verification.

    rows/bands tuned so the LSH S-curve threshold (1/bands)^(bands/num_hashes)
    sits near ``jaccard_threshold``. Self-join is on (band_id, band_hash)
    -- an equi-join Catalyst executes as a shuffled hash join on the
    bucket key; the cross product never materializes.

    ``max_bucket_df`` guards the hot-bucket blowup: a boilerplate phrase
    shared by 100k documents puts them all in one (band_id, band_hash)
    bucket, and the self-join inside it is quadratic. Buckets over the
    cap are STAR-CAPPED instead of dropped: every member pairs only with
    the bucket's min-id hub, so the clique's O(n^2) candidates become
    O(n) while connectivity survives -- a downstream connected-components
    "keep one per cluster" still sees the whole duplicate cluster through
    the hub. (Dropping hot buckets, the winnowing-style df-cap, would
    silently lose exactly the mega-clusters dedup exists to catch.)
    ``None`` disables the cap.

    ``base_hash="sha60"`` (default) makes the whole pipeline -- shingle
    hash, exact affine permutations mod 2^61-1, band keys, star-cap,
    Jaccard verify -- bit-exactly mirrorable in DuckDB SQL, which is how
    the driver gate oracle-checks it. "xxhash64" is the cheaper
    non-oracle option (same plan shape). The band key is the signature
    slice itself rendered as a CSV string (not a hash of it), so band
    collisions are EXACTLY slice equality in both engines.
    """
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    rows_per_band = num_hashes // bands

    supplied = with_sig is not None
    if with_sig is None:
        with_sig = minhash_with_sig(
            df, id_col, text_col,
            shingle_words=shingle_words, num_hashes=num_hashes,
            base_hash=base_hash,
        )
    with_sig = with_sig.select(
        F.col(id_col).alias("_id"),
        "_hashes",
        _guard_sig_width(F.col("_sig"), num_hashes).alias("_sig")
        if supplied
        else F.col("_sig"),
    )

    def _band_key(b: int):
        # The slice itself as a CSV string: exact (no hash collisions)
        # and reproducible in any SQL engine (array_to_string).
        return F.array_join(
            F.transform(
                F.slice("_sig", b * rows_per_band + 1, rows_per_band),
                lambda x: x.cast("string"),
            ),
            ",",
        )

    banded = with_sig.select(
        "_id",
        "_hashes",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        _band_key(b).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band"),
    ).select("_id", "_hashes", "_band.band_id", "_band.band_hash")

    if max_bucket_df is not None:
        from pyspark.sql import Window

        bucket_w = Window.partitionBy("band_id", "band_hash")
        banded = banded.withColumn("_df", F.count(F.lit(1)).over(bucket_w))
        small = banded.filter(F.col("_df") <= max_bucket_df)
        hot = banded.filter(F.col("_df") > max_bucket_df)
        # Hub = the bucket's min-id row (carries its shingle hashes for
        # the verify stage); every other member pairs with the hub only.
        hub_rn = F.row_number().over(bucket_w.orderBy("_id"))
        hubs = (
            hot.withColumn("_rn", hub_rn)
            .filter(F.col("_rn") == 1)
            .select(
                "band_id", "band_hash",
                F.col("_id").alias("_hub_id"),
                F.col("_hashes").alias("_hub_hashes"),
            )
        )
        star = (
            hot.join(hubs, ["band_id", "band_hash"])
            .filter(F.col("_id") > F.col("_hub_id"))
            .select(
                F.col("_hub_id").alias("id_a"),
                F.col("_id").alias("id_b"),
                F.col("_hub_hashes").alias("_sh_a"),
                F.col("_hashes").alias("_sh_b"),
            )
        )
    else:
        small = banded
        star = None

    left = small.alias("a")
    right = small.alias("b")
    pairs = (
        left.join(
            right,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col("a._id") < F.col("b._id"),
            ],
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._hashes").alias("_sh_a"),
            F.col("b._hashes").alias("_sh_b"),
        )
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    pairs = pairs.dropDuplicates(["id_a", "id_b"])

    if not verify:
        return pairs.select("id_a", "id_b")

    inter = F.size(F.array_intersect("_sh_a", "_sh_b")).cast("double")
    union = F.size(F.array_union("_sh_a", "_sh_b")).cast("double")
    return (
        pairs.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_hamming: int = 3,
    chunks: int = 4,
    base_hash: str = "sha60",
) -> DataFrame:
    """SimHash near-dup pairs: Hamming(sig_a, sig_b) <= max_hamming.

    With ``chunks`` 16-bit bands over the 64-bit signature, any pair
    within Hamming <= chunks-1 must agree on at least one band
    (pigeonhole), so banding is lossless for max_hamming <= chunks-1.

    ``base_hash="sha60"`` (default) hashes tokens JVM-side with the
    SQL-mirrorable 60-bit sha256 prefix, making the signature, banding,
    and Hamming verify bit-exactly reproducible in DuckDB (the driver
    oracle). Bits 60-63 of the signature are then always 0 (still
    lossless banding; the top chunk just has 12 informative bits).
    "blake2b" keeps the legacy Python-side string hashing.
    """
    assert max_hamming <= chunks - 1, "banding would miss pairs"
    bits_per_chunk = 64 // chunks

    df = fan_out(df)

    words = F.split(normalized_text(text_col), " ")
    if base_hash == "blake2b":
        with_sig = df.select(
            F.col(id_col).alias("_id"), simhash_udf()(words).alias("_sig")
        )
    else:
        hash_fn = base_hash_fn(base_hash)
        sim = simhash_from_hashes_udf()
        with_sig = df.select(
            F.col(id_col).alias("_id"),
            sim(F.transform(words, lambda w: hash_fn(w))).alias("_sig"),
        )

    mask = F.lit((1 << bits_per_chunk) - 1)
    banded = with_sig.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftright("_sig", c * bits_per_chunk)
                        .bitwiseAND(mask)
                        .alias("chunk_val"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("_c"),
    ).select("_id", "_sig", "_c.chunk_id", "_c.chunk_val")

    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.chunk_id") == F.col("b.chunk_id"),
                F.col("a.chunk_val") == F.col("b.chunk_val"),
                F.col("a._id") < F.col("b._id"),
            ],
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming_distance64(F.col("a._sig"), F.col("b._sig"))
            .cast("long")
            .alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    block_cols: tuple[str, ...] = ("lang",),
    length_col: str | None = "n_chars",
    length_bucket: int = 64,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Exact word-set Jaccard within blocking keys -- SQL-expressible.

    Blocking = equality on ``block_cols`` + same length bucket (near
    dups have near-equal lengths). Inside a block the join is quadratic,
    so blocks must stay small; this is the oracle-checkable baseline the
    LSH variants are validated against.
    """
    prepared = df.select(
        F.col(id_col).alias("_id"),
        *[F.col(c) for c in block_cols],
        *(
            [F.floor(F.col(length_col) / length_bucket).cast("bigint").alias("_lb")]
            if length_col
            else []
        ),
        F.array_distinct(F.split(normalized_text(text_col), " ")).alias("_words"),
    )
    a, b = prepared.alias("a"), prepared.alias("b")
    conds = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    if length_col:
        conds.append(F.col("a._lb") == F.col("b._lb"))
    conds.append(F.col("a._id") < F.col("b._id"))

    inter = F.size(F.array_intersect(F.col("a._words"), F.col("b._words"))).cast("double")
    union = F.size(F.array_union(F.col("a._words"), F.col("b._words"))).cast("double")
    return (
        a.join(b, on=conds)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            (inter / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


def duplicate_span_stats(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 16,
    min_count: int = 2,
    base_hash: str = "sha60",
) -> DataFrame:
    """Exact-substring duplication stats (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): hash
    every ``span_tokens``-token window (stride 1) of the normalized
    text and count occurrences CORPUS-WIDE; a span is duplicated when
    its hash appears >= ``min_count`` times anywhere (other docs or
    elsewhere in the same doc). Returns per doc:

        (id, n_spans, n_dup_spans, dup_span_fraction)

    -- the signal recipes use to drop or trim boilerplate-heavy docs.
    The pairwise dedup family (minhash/simhash/winnowing) answers "are
    these two docs near-copies"; this answers the orthogonal corpus-
    global question "how much of THIS doc is repeated text".

    Scale shape: span enumeration is a NARROW pass (sequence +
    transform + posexplode, rows ~ total tokens); the frequency count
    is one shuffle on the span hash with map-side combine carrying
    most of the weight (duplicated hashes are by definition the heavy
    groups); the join back is hash-partitioned on the same key so AQE
    reuses the exchange, and the final per-doc aggregate shuffles only
    (doc, flag) pairs. That is the same cost envelope as the
    suffix-array sharding in the paper, expressed as three standard
    shuffles -- no suffix array, no driver state. ``base_hash="sha60"``
    admits the bit-exact DuckDB oracle; pass "xxhash64" for the
    cheaper production hash (same plan, no SQL mirror).
    """
    hash_fn = base_hash_fn(base_hash)
    L = span_tokens
    toks = F.split(normalized_text(F.col(text_col)), " ")
    base = fan_out(df).select(
        F.col(id_col), toks.alias("_ws"), F.size(toks).alias("_n")
    )
    spans = base.select(
        id_col,
        F.explode(
            F.when(
                F.col("_n") >= L,
                F.transform(
                    F.sequence(F.lit(1), F.col("_n") - L + 1),
                    lambda i: hash_fn(
                        F.array_join(F.slice(F.col("_ws"), i, L), " ")
                    ),
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("_h"),
    )
    freq = spans.groupBy("_h").agg(F.count(F.lit(1)).alias("_cnt"))
    per_doc = (
        spans.join(freq, "_h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(
                F.when(F.col("_cnt") >= min_count, F.lit(1)).otherwise(F.lit(0))
            ).cast("long").alias("n_dup_spans"),
        )
    )
    # Docs shorter than one span still report (0, 0, 0.0).
    return (
        base.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("long").alias(
                "n_dup_spans"
            ),
            F.when(
                F.coalesce(F.col("n_spans"), F.lit(0)) > 0,
                F.col("n_dup_spans").cast("double")
                / F.col("n_spans").cast("double"),
            ).otherwise(F.lit(0.0)).alias("dup_span_fraction"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 16,
    min_count: int = 2,
    base_hash: str = "sha60",
) -> DataFrame:
    """Excise corpus-duplicated spans from each document (the removal
    half of Lee et al. 2022 -- ``duplicate_span_stats`` measures, this
    CUTS): a token is removed when ANY ``span_tokens``-token window
    covering it occurs >= ``min_count`` times corpus-wide; survivors
    reassemble in order. Returns per doc:

        (id, n_tokens, n_removed_tokens, text)

    Every input document is present -- docs shorter than one span keep
    all tokens; fully-duplicated docs come back with empty text.

    Scale shape: the span enumeration / frequency count / dup-flag join
    are EXACTLY ``duplicate_span_stats``'s three shuffles. The extra
    work is (a) expanding dup span starts to their covered positions --
    ``span_tokens x n_dup_spans`` rows, bounded by the duplicated mass,
    with the per-(doc,pos) distinct absorbing the heavy overlap case
    (consecutive dup starts in one doc) via map-side combine -- and
    (b) the per-doc ordered reassembly, a sorted-struct collect on the
    same doc-keyed shuffle the final aggregate needs anyway. No
    suffix array, no driver state; linear in corpus tokens.

    ``base_hash="sha60"`` admits the bit-exact DuckDB oracle
    (generate_series covered-position mirror + string_agg ORDER BY
    reassembly); "xxhash64" is the cheaper production hash.
    """
    hash_fn = base_hash_fn(base_hash)
    L = span_tokens
    toks = F.split(normalized_text(F.col(text_col)), " ")
    base = fan_out(df).select(
        F.col(id_col), toks.alias("_ws"), F.size(toks).alias("_n")
    )
    tokens = base.select(
        F.col(id_col), F.posexplode("_ws").alias("_p0", "_tok")
    ).select(id_col, (F.col("_p0") + 1).alias("pos"), "_tok")
    starts = (
        base.filter(F.col("_n") >= L)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("_n") - L + 1),
                    lambda i: F.struct(
                        i.alias("start"),
                        hash_fn(
                            F.array_join(F.slice(F.col("_ws"), i, L), " ")
                        ).alias("h"),
                    ),
                )
            ).alias("_s"),
        )
        .select(id_col, "_s.start", "_s.h")
    )
    freq = starts.groupBy("h").agg(F.count(F.lit(1)).alias("_cnt"))
    dup_starts = starts.join(
        freq.filter(F.col("_cnt") >= min_count).select("h"), "h", "left_semi"
    )
    covered = dup_starts.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.col("start"), F.col("start") + F.lit(L - 1))
        ).alias("pos"),
    ).distinct()
    marked = tokens.join(
        covered.withColumn("_rm", F.lit(1)), [id_col, "pos"], "left"
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(
            F.when(F.col("_rm").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("n_removed_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_rm").isNull(),
                            F.struct(F.col("pos"), F.col("_tok")),
                        )
                    )
                ),
                lambda x: x["_tok"],
            ),
            " ",
        ).alias(text_col),
    )


def winnow_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 20,
    base_hash: str = "sha60",
) -> DataFrame:
    """Containment-style near-dup pairs via shared winnowing fingerprints.

    Winnowing guarantees any shared substring of length >= k+w-1 yields
    a shared fingerprint, so this catches COPIED PASSAGES even when the
    documents differ globally (where set-level Jaccard/MinHash scores
    low). Pair generation = explode fingerprints + equi-join -- the same
    scalable shape as MinHash banding.

    ``max_df`` drops fingerprints occurring in more than that many
    documents before the join ("stop-fingerprints") -- boilerplate
    phrases shared by thousands of documents would otherwise make the
    join quadratic in the hottest key. Identical to the df-cap every
    production shingle pipeline applies; join cost is then bounded by
    n_fingerprints x max_df^2.
    """
    from ..functions.text import gram_hashes, winnow_from_hashes

    # Two-step select: gram hashes MUST be a materialized column before
    # the window pass, else Catalyst inlines the transform once per
    # window (quadratic per document -- hangs on 3000-char docs).
    fp = (
        df.select(
            F.col(id_col).alias("_id"),
            gram_hashes(text_col, k=k, base_hash=base_hash).alias("_gh"),
        )
        .select("_id", F.explode(winnow_from_hashes("_gh", w=w)).alias("_fp"))
    )
    rare = fp.groupBy("_fp").agg(F.count(F.lit(1)).alias("_df")).filter(
        F.col("_df") <= max_df
    )
    fp = fp.join(rare.select("_fp"), "_fp", "left_semi")
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, on=[F.col("a._fp") == F.col("b._fp"),
                      F.col("a._id") < F.col("b._id")])
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared_fingerprints"))
        .filter(F.col("shared_fingerprints") >= min_shared)
    )


def embedding_cosine_pairs_gemm(
    emb_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    block_col: str = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """GEMM variant of embedding_cosine_pairs: one BLAS matmul per block
    (applyInPandas) instead of a per-pair fold expression.

    ~10x faster at 50k vectors; scores come from float64 blocked
    summation, so they are numerically equal but not BIT-identical to
    the fold -- use the fold variant where a hash-exact oracle compares
    values, this one for production-scale runs (blocks at scale =
    IVF cluster_id, keeping each GEMM bounded).
    """
    import numpy as np
    import pandas as pd

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        ids = pdf[id_col].to_numpy()
        v = np.asarray(list(pdf[vec_col]), dtype=np.float64)
        norms = np.linalg.norm(v, axis=1)
        norms[norms == 0] = 1.0
        sims = (v @ v.T) / np.outer(norms, norms)
        iu = np.triu_indices(n, k=1)
        mask = sims[iu] >= threshold
        a, b = ids[iu[0][mask]], ids[iu[1][mask]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": sims[iu][mask]})

    out_schema = (
        f"id_a {emb_df.schema[id_col].dataType.simpleString()}, "
        f"id_b {emb_df.schema[id_col].dataType.simpleString()}, "
        "cosine double"
    )
    return (
        emb_df.select(id_col, vec_col, block_col)
        .groupBy(block_col)
        .applyInPandas(block_pairs, out_schema)
    )


def embedding_cosine_pairs_ivf(
    emb_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    n_clusters: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
    index=None,
) -> DataFrame:
    """The 100 TB cosine-dedup composition: block by IVF ``cluster_id``.

    Data-driven blocking (the tree-AH leaf-locality analog,
    common/config.py:36-38): KMeans assigns every vector a cluster, and
    the GEMM pair scan runs per cluster. Unlike label blocking -- whose
    few distinct values approach all-pairs as the corpus grows -- the
    cluster count scales WITH the data (n_clusters ~ rows/500), keeping
    each block's quadratic scan bounded at ~500x500 regardless of total
    size.

    Recall caveat: a near-dup pair straddling a cluster boundary is
    missed. At dedup-grade thresholds (>= 0.9) the two vectors are
    nearly collinear and KMeans co-assigns them unless the pair sits on
    a Voronoi boundary; tests/test_dedup.py quantifies recall >= 0.95
    vs the unblocked exact scan on a clustered fixture. For exact
    guarantees at scale, rerun with jittered seeds and union, or use
    MinHash on the text side.

    Pass a prebuilt ``index`` (IVFIndex over the same rows) to reuse an
    existing layout instead of re-clustering.
    """
    if index is None:
        from .ivf import build_ivf_index

        index = build_ivf_index(
            emb_df, id_col=id_col, vec_col=vec_col,
            n_clusters=n_clusters, seed=seed,
        )
    return embedding_cosine_pairs_gemm(
        index.assigned, id_col, vec_col,
        block_col="cluster_id", threshold=threshold,
    )


def embedding_cosine_pairs(
    emb_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    block_col: str | None = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity.

    Blocked self-join (equi-join on ``block_col``) keeps the pair count
    linear in block sizes; for unblocked corpora use the IVF layout
    (operators/ivf.py) to bucket by coarse centroid first.
    """
    prepared = emb_df.select(
        F.col(id_col).alias("_id"),
        *( [F.col(block_col)] if block_col else [] ),
        F.col(vec_col).alias("_v"),
        l2_norm(vec_col).alias("_n"),
    )
    a, b = prepared.alias("a"), prepared.alias("b")
    conds = [F.col("a._id") < F.col("b._id")]
    if block_col:
        conds.insert(0, F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))

    cos = dot_product(F.col("a._v"), F.col("b._v")) / (F.col("a._n") * F.col("b._n"))
    return (
        a.join(b, on=conds)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def dedup_boilerplate_lines(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    max_line_df: int = 1,
    line_counts: DataFrame | None = None,
) -> DataFrame:
    """Line-level boilerplate removal (the CCNet/RefinedWeb paragraph
    dedup stage): drop every line that appears in MORE than
    ``max_line_df`` distinct documents (navigation bars, cookie
    banners, license footers -- the exact-duplicate text that document-
    level dedup cannot touch because the surrounding documents differ),
    then reassemble each document's surviving lines in order.

    Returns (id_col, n_lines, n_removed, text) -- every input document
    is present, including fully-boilerplate ones (empty text).

    Scale shape: one narrow posexplode (documents -> lines), ONE
    shuffle for the line document-frequency table (map-side combine
    absorbs the duplicated-line mass -- the heaviest lines are exactly
    the ones combiners collapse), one shuffle-join back (AQE picks the
    strategy; the df table is bounded by distinct lines), and a per-doc
    sorted-struct reassembly on the same doc-keyed shuffle the final
    aggregate needs anyway. No pairwise comparison anywhere -- cost is
    linear in corpus lines at any scale.

    ``line_counts``: a prebuilt (line, n_docs) document-frequency
    table (e.g. the streaming-maintained one from
    streaming/linestats.py). Per-batch partial counts are additive
    because each document arrives in exactly one batch, so the
    maintained table equals batch recomputation and cleaning under it
    is bit-equal to self-counting; it also enables cleaning a SLICE of
    the corpus against corpus-global frequencies.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    if line_counts is not None:
        counts = line_counts.select(
            "line", F.col("n_docs").cast("long").alias("_line_df")
        )
    else:
        counts = lines.groupBy("line").agg(
            F.countDistinct(id_col).alias("_line_df")
        )
    # left join: a line absent from an EXTERNAL count table has df 0
    # (keep); with self-counting the join always matches, so the left
    # join is exactly the inner join there.
    flagged = lines.join(counts, "line", "left").withColumn(
        "_keep",
        F.coalesce(F.col("_line_df"), F.lit(0)) <= F.lit(max_line_df),
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum((~F.col("_keep")).cast("long")).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep"),
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda x: x["line"],
                ),
                sep,
            ).alias(text_col),
        )
    )


def minhash_banded_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    shingle_words: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    base_hash: str = "xxhash64",
    with_sig: DataFrame | None = None,
) -> DataFrame:
    """(id, band_id, band_hash, sig) per document x band -- the
    standalone banding stage of minhash_candidate_pairs, for consumers
    that match against a MAINTAINED band table instead of self-joining
    (streaming near-dup suppression, cross-corpus lookup). The band key
    is the signature slice itself as a CSV string (exact slice
    equality, engine-portable); ``sig`` rides along so a matched pair
    can be verified by MinHash component agreement without re-reading
    either document's text.

    ``with_sig`` accepts a precomputed ``minhash_with_sig`` frame so a
    consumer that also builds candidate pairs runs the signature UDF
    once (r17; the streaming batch body ran it twice per epoch).
    """
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    rows_per_band = num_hashes // bands
    supplied = with_sig is not None
    if with_sig is None:
        with_sig = minhash_with_sig(
            df, id_col, text_col,
            shingle_words=shingle_words, num_hashes=num_hashes,
            base_hash=base_hash,
        )
    with_sig = with_sig.select(
        F.col(id_col),
        (
            _guard_sig_width(F.col("_sig"), num_hashes)
            if supplied
            else F.col("_sig")
        ).alias("sig"),
    )

    def _key(b: int):
        return F.array_join(
            F.transform(
                F.slice("sig", b * rows_per_band + 1, rows_per_band),
                lambda x: x.cast("string"),
            ),
            ",",
        )

    return with_sig.select(
        id_col,
        "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"), _key(b).alias("band_hash")
                )
                for b in range(bands)
            ])
        ).alias("_band"),
    ).select(id_col, "_band.band_id", "_band.band_hash", "sig")


def edit_distance_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    threshold: int = 2,
    prefix_len: int = 16,
) -> DataFrame:
    """Near-duplicate pairs within a bounded EDIT DISTANCE (Levenshtein),
    the classical complement to set-based MinHash/SimHash: it catches
    small in-place edits (typo fixes, single-token swaps) that keep
    shingle sets almost identical but also certifies the exact number
    of edits, which threshold-Jaccard cannot.

    Blocking contract (recall-oriented, like MinHash banding): a pair
    is compared only if the documents agree on their first
    ``prefix_len`` characters AND their lengths differ by at most
    ``threshold`` (a true edit-distance <= threshold pair always
    passes the length band; prefix-divergent edits escape the block,
    exactly as band-hash collisions bound MinHash recall).

    Scale shape: one shuffle on the prefix block key; per-key groups
    are tiny for natural corpora (distinct openings), so the self-join
    is linear in documents, never all-pairs. The comparison itself
    uses Spark's BANDED 3-arg ``levenshtein(a, b, threshold)`` --
    O(len x threshold) DP that bails out at -1 -- so a pathological
    block of long, unrelated, same-prefix documents costs
    len x threshold per pair, not len^2.
    """
    sides = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_text"),
        F.length(text_col).alias("_len"),
        F.substring(text_col, 1, prefix_len).alias("_bk"),
    )
    a, b = sides.alias("a"), sides.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a._bk") == F.col("b._bk"),
                F.col("a._id") < F.col("b._id"),
                F.abs(F.col("a._len") - F.col("b._len")) <= threshold,
            ],
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.levenshtein(F.col("a._text"), F.col("b._text"), threshold)
            .cast("long")
            .alias("edit_distance"),
        )
        .filter(
            (F.col("edit_distance") >= 0)
            & (F.col("edit_distance") <= threshold)
        )
    )
