from .cleaning import (
    ilike_any,
    first_match_category,
    null_to,
    pg_bool_yes_no,
    truncate_at_comma,
    parse_duration_days,
    cap_value,
)
from .text import (
    whitespace_tokens,
    token_count,
    word_shingles,
    normalized_text,
    md5_fingerprint,
    quality_features,
)
from .vectors import dot, l2_norm, cosine_similarity

__all__ = [
    "ilike_any",
    "first_match_category",
    "null_to",
    "pg_bool_yes_no",
    "truncate_at_comma",
    "parse_duration_days",
    "cap_value",
    "whitespace_tokens",
    "token_count",
    "word_shingles",
    "normalized_text",
    "md5_fingerprint",
    "quality_features",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
