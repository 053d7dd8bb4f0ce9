from .vector import (
    dot_product,
    cosine_similarity,
    l2_norm,
    l2_normalize,
)
from .text import (
    token_count,
    whitespace_token_count,
    quality_score,
    stopword_ratio,
    alpha_ratio,
    language_id,
    doc_fingerprint,
    normalized_text,
    word_shingles,
    char_ngrams,
    winnowing_fingerprints,
)
from .hashing import (
    hash_embedding_udf,
    hash_embedding_numpy,
    minhash_signature_udf,
    simhash_udf,
    hamming_distance64,
)

__all__ = [
    "dot_product",
    "cosine_similarity",
    "l2_norm",
    "l2_normalize",
    "token_count",
    "whitespace_token_count",
    "quality_score",
    "stopword_ratio",
    "alpha_ratio",
    "language_id",
    "doc_fingerprint",
    "normalized_text",
    "word_shingles",
    "char_ngrams",
    "winnowing_fingerprints",
    "hash_embedding_udf",
    "hash_embedding_numpy",
    "minhash_signature_udf",
    "simhash_udf",
    "hamming_distance64",
]
