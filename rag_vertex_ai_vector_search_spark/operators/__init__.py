from .knn import knn_search, brute_force_topk
from .ivf import IVFIndex, build_ivf_index, ivf_search
from .upsert import merge_by_key, point_lookup, point_update
from .dedup import (
    dedup_exact,
    duplicate_clusters,
    minhash_candidate_pairs,
    simhash_near_dup_pairs,
    ngram_jaccard_pairs,
    embedding_cosine_pairs,
)
from .ingest import ingest_documents, IngestResult, TokenLimitExceeded
from .asof import asof_join
from .restricts import restrict_predicate
from .ann_lsh import lsh_topk

__all__ = [
    "knn_search",
    "brute_force_topk",
    "IVFIndex",
    "build_ivf_index",
    "ivf_search",
    "merge_by_key",
    "point_lookup",
    "point_update",
    "dedup_exact",
    "duplicate_clusters",
    "minhash_candidate_pairs",
    "simhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "embedding_cosine_pairs",
    "ingest_documents",
    "IngestResult",
    "TokenLimitExceeded",
    "asof_join",
    "restrict_predicate",
    "lsh_topk",
]
