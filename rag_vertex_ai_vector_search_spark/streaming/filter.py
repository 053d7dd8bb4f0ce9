"""Streaming training-data filter: quality gate + Bloom-filter
decontamination + deterministic mixing, all STATELESS.

The batch pipeline (q_training_corpus_pipeline) joins the corpus
against the benchmark's n-gram set; a streaming ingest can't afford a
per-batch join against 1e8 eval grams, and doesn't need one: a Bloom
filter over the eval gram hashes is ~150 MB at 1% false positives
where the raw hash set is ~1 GB, ships once by broadcast, and its
false positives only ever REMOVE extra documents -- the safe direction
for decontamination (never leaks a benchmark doc into training data).

Everything here is a narrow projection/filter: no state store, no
watermark, no shuffle -- the filter runs inside the ingest micro-batch
at scan speed, composable in front of stream_merge_into_index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import base_hash_fn, quality_score, word_shingles
from ..operators.splits import weighted_sample

_BLOOM_HASHES = 7  # k ~ ln(2) * bits/n at ~1% fp with bits = 10n


class GramBloom:
    """Bloom filter over 60/64-bit gram hashes. k derived double hashes
    h_i = (h + i * (h >> 17 | 1)) mod m -- Kirsch-Mitzenmacher, so
    membership needs only the one base hash the pipeline already
    computes."""

    def __init__(self, bits: np.ndarray, n_bits: int):
        self.bits = bits  # uint8 array, n_bits/8 bytes
        self.n_bits = n_bits

    @staticmethod
    def _positions(h: np.ndarray, n_bits: int) -> np.ndarray:
        h = h.astype(np.uint64)
        step = (h >> np.uint64(17)) | np.uint64(1)
        return np.stack([
            (h + np.uint64(i) * step) % np.uint64(n_bits)
            for i in range(_BLOOM_HASHES)
        ])  # (k, n)

    def add(self, hashes: np.ndarray) -> None:
        pos = self._positions(np.asarray(hashes, dtype=np.uint64), self.n_bits)
        np.bitwise_or.at(
            self.bits, (pos // 8).ravel(),
            (np.uint8(1) << (pos % 8).astype(np.uint8)).ravel(),
        )

    def maybe_contains(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: True iff ALL k bits set (may be a
        false positive; never a false negative)."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(hashes, dtype=np.uint64), self.n_bits)
        byte = self.bits[pos // 8]
        bit = (byte >> (pos % 8).astype(np.uint8)) & 1
        return bit.all(axis=0)


def build_gram_bloom(
    eval_df: DataFrame,
    *,
    text_col: str = "text",
    n: int = 5,
    base_hash: str = "sha60",
    bits_per_gram: int = 10,
) -> GramBloom:
    """Bloom filter of the eval corpus's distinct n-gram hashes.

    Per-partition partial blooms are OR-merged on the driver: the
    collect is ``n_partitions x n_bits/8`` bytes, never the gram set
    itself -- at 1e8 grams and 10 bits each that is ~125 MB total
    regardless of corpus size.
    """
    hash_fn = base_hash_fn(base_hash)
    grams = eval_df.select(
        F.explode(word_shingles(F.col(text_col), n)).alias("_g")
    ).select(hash_fn(F.col("_g")).alias("_gh"))
    n_grams = max(grams.count(), 1)
    n_bits = int(n_grams * bits_per_gram)
    n_bits = max(1024, (n_bits + 7) // 8 * 8)

    def partial(batches):
        bloom = GramBloom(np.zeros(n_bits // 8, dtype=np.uint8), n_bits)
        for pdf in batches:
            if len(pdf):
                bloom.add(pdf["_gh"].to_numpy())
        yield pd.DataFrame({"bits": [bloom.bits.tobytes()]})

    parts = grams.mapInPandas(partial, "bits binary").collect()
    merged = np.zeros(n_bits // 8, dtype=np.uint8)
    for r in parts:
        merged |= np.frombuffer(r.bits, dtype=np.uint8)
    return GramBloom(merged, n_bits)


def contaminated_expr(
    spark_df: DataFrame,
    bloom: GramBloom,
    *,
    text_col: str = "text",
    n: int = 5,
    min_shared: int = 1,
    base_hash: str = "sha60",
) -> Column:
    """Boolean Column: does this document share >= ``min_shared``
    n-grams with the (Bloom-approximated) eval set? One pandas UDF
    over the JVM-computed gram-hash arrays; the bloom ships by torrent
    broadcast, fetched once per executor."""
    bc = spark_df.sparkSession.sparkContext.broadcast(
        (bloom.bits, bloom.n_bits)
    )

    @F.pandas_udf(T.BooleanType())
    def _check(gram_arrays: pd.Series) -> pd.Series:
        bits, n_bits = bc.value
        b = GramBloom(bits, n_bits)
        out = []
        for arr in gram_arrays:
            if arr is None or len(arr) == 0:
                out.append(False)
                continue
            hits = b.maybe_contains(np.asarray(arr, dtype=np.int64))
            out.append(int(hits.sum()) >= min_shared)
        return pd.Series(out)

    hash_fn = base_hash_fn(base_hash)
    gram_hashes = F.transform(
        word_shingles(F.col(text_col), n), lambda s: hash_fn(s)
    )
    return _check(gram_hashes)


def stream_training_filter(
    stream_df: DataFrame,
    bloom: GramBloom,
    *,
    text_col: str = "text",
    quality_threshold: float = 0.55,
    rates: dict[str, float] | None = None,
    stratum_col: str = "lang",
    n: int = 5,
) -> DataFrame:
    """Compose the stateless stages on a (possibly streaming)
    DataFrame: quality gate -> Bloom decontamination -> deterministic
    mixing. Works identically on batch and streaming inputs (narrow
    ops only), so the batch pipeline doubles as its own oracle in
    tests."""
    out = stream_df.filter(
        quality_score(F.col(text_col)) > quality_threshold
    ).filter(
        ~contaminated_expr(stream_df, bloom, text_col=text_col, n=n)
    )
    if rates:
        out = weighted_sample(out, rates, stratum_col=stratum_col)
    return out
