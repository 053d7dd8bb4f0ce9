"""Deterministic hashing: pseudo-embeddings, MinHash, SimHash.

The reference's embedder is a remote model RPC
(common/utils/embeddings.py:120-130, text-multilingual-embedding-002).
For a hermetic engine we keep the same interface -- text column in,
unit-normalized float vector out -- behind a deterministic hash
pseudo-embedder (FIXTURES.md): ``vec(text)[i] = f(sha256(text || i))``,
L2-normalized. A real model plugs into the same pandas-UDF seam (swap
``_embed_batch``); batching, retry, and alignment semantics are
identical either way.

All UDFs here are Arrow-batched pandas UDFs (the reference's
EMBEDDING_BATCH_SIZE=10 / ThreadPoolExecutor fan-out,
embeddings.py:164-192, becomes Arrow batching + task parallelism).
Rows keep their embeddings on the same row by construction, fixing the
reference's completion-order misalignment bug (embeddings.py:180-188,
SURVEY.md O6).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_DIM = 64

# MinHash parameters: k independent permutations via (a*x + b) mod p.
# p = 2^61 - 1 (Mersenne) so modular products reduce with shifts:
# 2^61 === 1 (mod p) lets a 91-bit intermediate fold into 64 bits.
MINHASH_PRIME = (1 << 61) - 1
_MINHASH_COEFF_BITS = 30  # a, b < 2^30 keeps every intermediate in uint64


def _stable_hash64(s: str) -> int:
    """Stable 64-bit hash (blake2b) -- Python's hash() is salted per run."""
    return struct.unpack("<Q", hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest())[0]


def hash_embedding_numpy(text: str, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Deterministic pseudo-embedding of one string (float32, unit norm).

    Each sha256 digest yields FOUR components (32 bytes -> 4 uint64 ->
    [-1,1)), so a 64-dim vector costs 16 hashes, not 64."""
    n_blocks = (dim + 3) // 4
    buf = b"".join(
        hashlib.sha256(f"{text}||{i}".encode("utf-8")).digest()
        for i in range(n_blocks)
    )
    vals = np.frombuffer(buf, dtype="<u8")[:dim].astype(np.float64)
    raw = vals / float(1 << 63) - 1.0
    norm = np.linalg.norm(raw)
    if norm > 0:
        raw = raw / norm
    return raw.astype(np.float32)


# Reference retry policy: 3 attempts, 1 s fixed delay between them
# (common/config.py:60-61; per-call loop embeddings.py:100-118).
RETRY_ATTEMPTS = 3
RETRY_DELAY_S = 1.0


def make_embed_batch(
    embed_fn,
    max_retries: int = RETRY_ATTEMPTS,
    retry_delay_s: float = RETRY_DELAY_S,
    sleep=None,
):
    """Batch embed with uniform per-text retry + fixed delay.

    The reference retries only its single-text path and retries with a
    1 s sleep (embeddings.py:100-118); its batch path never retries
    (SURVEY.md §2.4). Here BOTH paths go through this loop. ``sleep``
    is injectable so tests run without wall-clock waits; no delay after
    the final attempt (fail fast, like the reference's raise at
    embeddings.py:115-118).
    """
    import time as _time

    do_sleep = _time.sleep if sleep is None else sleep

    def _embed_batch(texts) -> list:
        out = []
        for t in texts:
            last_err = None
            for attempt in range(max_retries):
                try:
                    out.append(embed_fn("" if t is None else t))
                    break
                except Exception as e:
                    last_err = e
                    if attempt + 1 < max_retries:
                        do_sleep(retry_delay_s)
            else:
                raise RuntimeError(
                    f"embedding failed after {max_retries} attempts"
                ) from last_err
        return out

    return _embed_batch


def hash_embedding_udf(
    dim: int = DEFAULT_DIM,
    max_retries: int = RETRY_ATTEMPTS,
    retry_delay_s: float = RETRY_DELAY_S,
    embed_fn=None,
):
    """pandas_udf: text column -> array<float> pseudo-embedding.

    ``embed_fn`` (str -> vector) is the real-model seam: swap the hash
    pseudo-embedder for a model client without touching batching, retry,
    or alignment semantics. Retry follows the reference policy
    (RETRY_ATTEMPTS=3 / 1 s delay, config.py:60-61) uniformly on the
    batch path (the reference forgot to, SURVEY.md §2.4).
    """
    fn = embed_fn if embed_fn is not None else (
        lambda t: hash_embedding_numpy(t, dim)
    )
    _embed_batch = make_embed_batch(fn, max_retries, retry_delay_s)

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _udf(texts: pd.Series) -> pd.Series:
        return pd.Series(_embed_batch(texts))

    return _udf


def _minhash_coeffs(num_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    hi = 1 << _MINHASH_COEFF_BITS
    rng = np.random.RandomState(seed)
    a = rng.randint(1, hi, size=num_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, hi, size=num_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def _affine_mod_mersenne(a: np.ndarray, b: np.ndarray, x: np.ndarray) -> np.ndarray:
    """EXACT (a*x + b) mod p over uint64, p = 2^61 - 1, a,b < 2^30.

    Naive ``(a*x + b) % p`` in uint64 silently computes
    ((a*x mod 2^64) + b) mod p -- a different (still deterministic, but
    not affine) map. Exactness here comes from splitting x and using
    2^61 === 1 (mod p):

      x = x_hi*2^30 + x_lo           (x reduced mod p first, so < 2^61)
      a*x = (a*x_hi)*2^30 + a*x_lo   (a*x_hi < 2^60, fits)
      t*2^30 mod p = t_hi + t_lo*2^30 where t = t_hi*2^31 + t_lo
                                     (because 2^31*2^30 = 2^61 === 1)

    Every intermediate stays < 2^63, so uint64 arithmetic is exact and
    the standard min-wise-independence-style guarantee of the affine
    family over F_p actually holds.
    """
    p = np.uint64(MINHASH_PRIME)
    x = x % p
    x_hi = x >> np.uint64(30)                      # < 2^31
    x_lo = x & np.uint64((1 << 30) - 1)            # < 2^30
    t = (a[:, None] * x_hi[None, :]) % p           # a*x_hi < 2^61, exact
    t_hi = t >> np.uint64(31)
    t_lo = t & np.uint64((1 << 31) - 1)
    shifted = (t_hi + (t_lo << np.uint64(30))) % p  # == t*2^30 mod p
    return (shifted + a[:, None] * x_lo[None, :] + b[:, None]) % p


def minhash_signature_udf(num_hashes: int = 64, seed: int = 42):
    """pandas_udf: array<bigint> PRE-HASHED shingles -> array<bigint>
    MinHash signature.

    The base shingle hash happens JVM-side (``xxhash64`` inside a
    ``transform``) so Arrow ships compact int64 arrays, not strings, and
    Python does only the vectorized (k x n) multiply-min. Empty shingle
    sets get the max sentinel so they never collide.
    """
    a, b = _minhash_coeffs(num_hashes, seed)

    def _sig(hashes) -> np.ndarray:
        if hashes is None or len(hashes) == 0:
            return np.full(num_hashes, np.int64(np.iinfo(np.int64).max))
        x = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
        # exact (a * x + b) mod p over k x n (see _affine_mod_mersenne)
        vals = _affine_mod_mersenne(a, b, x)
        return vals.min(axis=1).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _udf(col: pd.Series) -> pd.Series:
        return col.map(_sig)

    return _udf


def simhash_udf():
    """pandas_udf: array<string> tokens -> bigint 64-bit SimHash."""

    def _simhash(tokens) -> int:
        if tokens is None or len(tokens) == 0:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for tok in tokens:
            h = _stable_hash64(tok)
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        out = np.uint64(0)
        for i in range(64):
            if acc[i] > 0:
                out |= np.uint64(1) << np.uint64(i)
        return int(out.astype(np.int64))

    @F.pandas_udf(T.LongType())
    def _udf(col: pd.Series) -> pd.Series:
        return col.map(_simhash)

    return _udf


def simhash_from_hashes_udf():
    """pandas_udf: array<bigint> PRE-HASHED tokens -> bigint SimHash.

    Like ``simhash_udf`` but the base token hash happens JVM-side (e.g.
    ``sha60_hash`` inside a transform), so (a) Arrow ships compact int64
    arrays instead of token strings and (b) with sha60 the whole
    signature is mirrorable in DuckDB SQL for the driver's bit-exact
    oracle. Tokens keep their multiplicity (duplicate tokens vote
    twice). With a 60-bit base hash, bits 60-63 are always 0, so the
    signature is a positive int64 -- no sign-extension cases anywhere
    downstream (shifts, banding, XOR).
    """

    def _simhash(hashes) -> int:
        if hashes is None or len(hashes) == 0:
            return 0
        x = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
        bits = (x[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        acc = np.where(bits.astype(bool), 1, -1).sum(axis=0)
        out = np.uint64(0)
        for i in range(64):
            if acc[i] > 0:
                out |= np.uint64(1) << np.uint64(i)
        return int(out.astype(np.int64))

    @F.pandas_udf(T.LongType())
    def _udf(col: pd.Series) -> pd.Series:
        return col.map(_simhash)

    return _udf


def hamming_distance64(a, b):
    """Column expr: Hamming distance between two 64-bit SimHash columns.

    bit_count(a XOR b) -- pure JVM, codegen-friendly.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.bit_count(a.bitwiseXOR(b))
