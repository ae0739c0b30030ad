from .datespine import date_spine
from .surrogate_keys import surrogate_key_exact, surrogate_key_scalable
from .dedup import (
    connected_components,
    dedup_pipeline,
    exact_duplicates,
    filter_hot_shingles,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_candidates,
    simhash_near_duplicates,
)
from .asof import asof_join
from .similarity import (
    brute_force_topk,
    embedding_duplicate_pairs,
    ivf_assign,
    quantize_embeddings,
    train_ivf,
)
from .multimodal import (
    attach_binary_payload,
    decode_image_metadata,
    resize_image_metadata,
    sample_frames,
)
from .skew import salted_count, salted_count_distinct

__all__ = [
    "date_spine",
    "surrogate_key_exact",
    "surrogate_key_scalable",
    "connected_components",
    "dedup_pipeline",
    "exact_duplicates",
    "filter_hot_shingles",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_candidates",
    "simhash_near_duplicates",
    "asof_join",
    "brute_force_topk",
    "embedding_duplicate_pairs",
    "ivf_assign",
    "quantize_embeddings",
    "train_ivf",
    "attach_binary_payload",
    "decode_image_metadata",
    "resize_image_metadata",
    "sample_frames",
    "salted_count",
    "salted_count_distinct",
]
