"""LLM-data-pipeline extension suite (dedup, similarity, text analysis).

These run on the ``documents`` and ``embeddings`` testdata tables. All
hashing uses md5 hex (identical across Spark and DuckDB) so even the
MinHash/SimHash signatures are exactly oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import (
    md5_fingerprint,
    normalized_text,
    quality_features,
    token_count,
    whitespace_tokens,
)
from ..sources.parquet import read_table
from . import register

#: DuckDB expression for the same normalization as functions.text.normalized_text
_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


# =====================================================================
# x01 — exact deduplication: content-hash grouping, keep lowest doc_id.
# The canonical 100 TB exact-dedup plan: one shuffle on a 128-bit content
# hash (never on the raw text), row_number inside each hash bucket.
# =====================================================================
@register(
    "x01_dedup_exact",
    oracle=f"""
SELECT
    doc_id,
    fp,
    CAST(rn > 1 AS BOOLEAN) AS is_duplicate
FROM (
    SELECT
        doc_id,
        md5({_NORM_SQL}) AS fp,
        ROW_NUMBER() OVER (PARTITION BY md5({_NORM_SQL}) ORDER BY doc_id) AS rn
    FROM documents
)
""",
    covers=("X-DEDUP-EXACT", "W2"),
)
def x01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    fp = F.md5(normalized_text(F.col("text")).cast("binary"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        docs.select("doc_id", fp.alias("fp"))
        .withColumn("rn", F.row_number().over(w))
        .select("doc_id", "fp", (F.col("rn") > 1).alias("is_duplicate"))
    )


# =====================================================================
# x02 — document fingerprinting: md5-prefix content fingerprint (the
# "rolling hash" fingerprint surface; md5 keeps it engine-portable).
# =====================================================================
@register(
    "x02_doc_fingerprint",
    oracle=f"""
SELECT
    doc_id,
    substring(md5({_NORM_SQL}), 1, 16) AS fingerprint,
    CAST(length(text) AS BIGINT) AS n_chars_actual
FROM documents
""",
    covers=("X-TEXT-FINGERPRINT",),
)
def x02_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        md5_fingerprint(F.col("text")).alias("fingerprint"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


# =====================================================================
# x03 — token counting: whitespace tokens + BPE-ish regex tokens.
# regexp_extract_all with an RE2-safe pattern so Spark and DuckDB agree.
# =====================================================================
_BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@register(
    "x03_token_count",
    oracle=f"""
SELECT
    doc_id,
    CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS BIGINT) AS ws_tokens,
    CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT) AS bpe_tokens
FROM documents
""",
    covers=("X-TEXT-TOKENS",),
)
def x03_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0)).cast(
            "long"
        ).alias("bpe_tokens"),
    )


# =====================================================================
# x04 — quality scoring: length / punctuation / stopword features and a
# composite keep-score, all JVM-side expressions.
# =====================================================================
@register(
    "x04_text_quality",
    oracle="""
WITH feats AS (
    SELECT
        doc_id,
        CAST(length(text) AS BIGINT) AS n_chars,
        CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(string_split_regex(text, '\\s+'),
             t -> lower(t) IN ('the','a','of','and','to','in','is','it'))) AS BIGINT) AS stop_hits
    FROM documents
)
SELECT
    doc_id,
    n_chars,
    n_tokens,
    ROUND(stop_hits / GREATEST(n_tokens, 1)::DOUBLE, 6) AS stopword_ratio,
    ROUND(
        0.5 * (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END)
        + 0.5 * LEAST(stop_hits / GREATEST(n_tokens, 1)::DOUBLE * 5.0, 1.0),
        6
    ) AS quality_score
FROM feats
""",
    covers=("X-TEXT-QUALITY",),
)
def x04_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    base = docs.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        F.size(
            F.filter(
                whitespace_tokens(F.col("text")),
                lambda t: F.lower(t).isin(
                    "the", "a", "of", "and", "to", "in", "is", "it"
                ),
            )
        ).cast("long").alias("stop_hits"),
    )
    ratio = F.col("stop_hits") / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
    score = 0.5 * (
        F.when(F.col("n_tokens").between(20, 1000), F.lit(1.0)).otherwise(F.lit(0.0))
    ) + 0.5 * F.least(ratio * 5.0, F.lit(1.0))
    return base.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        F.round(ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )
