from .datespine import date_spine
from .surrogate_keys import surrogate_key_exact, surrogate_key_scalable
from .dedup import (
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_candidates,
)
from .similarity import brute_force_topk, embedding_duplicate_pairs, ivf_assign
from .multimodal import attach_binary_payload, decode_image_metadata
from .skew import salted_count, salted_count_distinct

__all__ = [
    "date_spine",
    "surrogate_key_exact",
    "surrogate_key_scalable",
    "exact_duplicates",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_candidates",
    "brute_force_topk",
    "embedding_duplicate_pairs",
    "ivf_assign",
    "attach_binary_payload",
    "decode_image_metadata",
    "salted_count",
    "salted_count_distinct",
]
