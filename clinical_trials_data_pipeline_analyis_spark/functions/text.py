"""Text-analysis expression builders (LLM-data-pipeline extension surface).

All native Catalyst expressions — tokenization, shingling, fingerprinting
and quality features run JVM-side inside whole-stage codegen; nothing here
drops to Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalized_text(col: Column) -> Column:
    """Lowercase, collapse whitespace, trim — canonical form for exact-dup
    hashing and shingling."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def whitespace_tokens(col: Column) -> Column:
    """Split on whitespace runs; empty string -> empty array (not [''])."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(whitespace_tokens(col)).cast("long")


#: BPE-ish pre-tokenization pattern: words, numbers, or single
#: punctuation marks. RE2-safe (no lookarounds) so the same pattern runs
#: in DuckDB oracles verbatim.
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_ish_tokens(col: Column) -> Column:
    """BPE-ish pre-tokenization (GPT-2-style contraction-less
    simplification) as an extracted-match array."""
    return F.regexp_extract_all(col, F.lit(BPE_TOKEN_PATTERN), 0)


def word_shingles(col: Column, k: int = 5) -> Column:
    """k-word shingles as an array of strings.

    Documents shorter than k tokens produce a single shingle of the whole
    text, so short docs still participate in dedup.
    """
    toks = whitespace_tokens(col)
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.transform(
        starts, lambda i: F.concat_ws(" ", F.slice(toks, i, k))
    )


def md5_fingerprint(col: Column, length: int = 16) -> Column:
    """Deterministic document fingerprint: md5 hex prefix of the
    normalized text. Portable across engines (DuckDB md5 produces the same
    hex), which is what makes the dedup oracles exactly checkable."""
    return F.substring(F.md5(normalized_text(col).cast("binary")), 1, length)


def quality_features(col: Column) -> dict[str, Column]:
    """Quality-scoring features: length, token count, mean token length,
    punctuation ratio, stopword ratio, uppercase ratio.

    Returned as a dict of named expressions so callers select exactly what
    they need (column pruning stays effective).
    """
    toks = whitespace_tokens(col)
    n_chars = F.length(col).cast("long")
    n_tokens = F.size(toks).cast("long")
    stopwords = ["the", "a", "of", "and", "to", "in", "is", "it"]
    stop_hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(stopwords))
    ).cast("long")
    n_punct = (
        n_chars - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    ).cast("long")
    n_upper = (
        n_chars - F.length(F.regexp_replace(col, r"[A-Z]", ""))
    ).cast("long")
    safe_tokens = F.greatest(n_tokens, F.lit(1)).cast("double")
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": F.round(
            (n_chars - F.greatest(n_tokens - 1, F.lit(0))) / safe_tokens, 6
        ),
        "punct_ratio": F.round(n_punct / safe_chars, 6),
        "stopword_ratio": F.round(stop_hits / safe_tokens, 6),
        "upper_ratio": F.round(n_upper / safe_chars, 6),
    }


#: tiny per-language marker lexicons for the n-gram/stopword language-ID
#: heuristic; deliberately simple and fully SQL-expressible.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "with"],
    "de": ["der", "die", "und", "ist", "mit"],
    "fr": ["le", "la", "et", "est", "avec"],
    "es": ["el", "la", "y", "es", "con"],
    "zh": ["de", "shi", "he", "zai", "le"],
}


def langid_scores(col: Column) -> dict[str, Column]:
    """Marker-token hit-count per language over single-space tokens
    (mirrors the x11 oracle's tokenization exactly)."""
    toks = F.split(F.lower(col), " ")
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }


#: PII redaction patterns, ordered (applied first-to-last; order matters
#: because the email pattern would otherwise eat the user part of a
#: later match). Restricted to the regex subset Java (Spark) and RE2
#: (DuckDB) interpret identically — no lookaround, no backreferences —
#: so the redaction is exactly oracle-checkable.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}\b", "<PHONE>"),
]


def redact_pii(col: Column) -> Column:
    """Replace emails, IPv4 addresses, and international-format phone
    numbers with typed placeholder tokens — the scrubbing pass an LLM
    training pipeline runs before a corpus ships. Row-local
    regexp_replace chain: pure whole-stage-codegen projection, no
    shuffle, no UDF."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind PII match counts (the audit metric next to redaction)."""
    return {
        kind: F.regexp_count(col, F.lit(pat)).cast("long")
        for kind, pat, _ in PII_PATTERNS
    }
