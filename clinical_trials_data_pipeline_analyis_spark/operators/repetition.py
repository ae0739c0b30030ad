"""Repetition-based quality signals (the Gopher/Dolma filter family).

Natural text repeats itself far less than boilerplate, SEO spam, or
degenerate generations; production corpus filters (Rae et al., Gopher
2021, table A1; the Dolma toolkit) therefore score every document on
repetition statistics and drop the tail. Reference corpus-quality
analog: the text-cleaning predicates of `aact_silver_layer.sql` (the
reference filters degenerate strings; these operators filter degenerate
DOCUMENTS).

Signals per document, all over whitespace tokens (the synthetic corpus
has no newlines, so line-level dup fractions degenerate — token-level
variants carry the same information):

- ``distinct_ratio``   — distinct tokens / total tokens (type-token
  ratio; low = repetitive).
- ``top_bigram_frac``  — occurrences of the most frequent 2-gram /
  total 2-grams (Gopher's "fraction in most common n-gram").
- ``max_run``          — longest run of consecutive identical tokens
  (degenerate-generation detector), via the gaps-and-islands
  construction: run id = running count of change points.

Scale shape: one posexplode (pre-spread like every explode feed in
``operators/dedup.py``), windows and aggregations all keyed by doc_id
(+run id) — dense, skew-bounded by max document length, never a global
window. Raw text never shuffles; only (doc_id, token) rows do, and a
100 TB deployment would hash the token to int first (kept as strings
here so the DuckDB oracle is directly comparable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import whitespace_tokens
from .dedup import _spread


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_tokens, distinct_ratio, top_bigram_frac, max_run), ratios
    rounded to 6dp; single-token documents get top_bigram_frac = 0."""
    toks = _spread(df).select(
        F.col(id_col),
        F.posexplode(whitespace_tokens(F.col(text_col))).alias("pos", "tok"),
    )

    w_doc = Window.partitionBy(id_col).orderBy("pos")
    seq = toks.select(
        id_col,
        "pos",
        "tok",
        F.lag("tok").over(w_doc).alias("prev"),
        F.lead("tok").over(w_doc).alias("next"),
    )

    # Gaps-and-islands: a new run starts wherever the token changes.
    runs = seq.withColumn(
        "run_id",
        F.sum(
            F.when(F.col("prev").isNull() | (F.col("prev") != F.col("tok")), 1)
            .otherwise(0)
        ).over(w_doc),
    )
    run_stats = (
        runs.groupBy(id_col, "run_id")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy(id_col)
        .agg(F.max("run_len").cast("bigint").alias("max_run"))
    )

    tok_stats = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.countDistinct("tok").cast("bigint").alias("n_distinct"),
    )

    bigrams = seq.filter(F.col("next").isNotNull()).select(
        id_col, F.concat_ws(" ", "tok", "next").alias("bigram")
    )
    bigram_stats = (
        bigrams.groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.max("cnt").cast("double").alias("top_cnt"),
            F.sum("cnt").cast("double").alias("total_bi"),
        )
    )

    return (
        tok_stats.join(run_stats, id_col)
        .join(bigram_stats, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias(
                "distinct_ratio"
            ),
            F.round(
                F.coalesce(F.col("top_cnt") / F.col("total_bi"), F.lit(0.0)), 6
            ).alias("top_bigram_frac"),
            "max_run",
        )
    )


def corpus_ngram_topk(
    df: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    k: int = 10,
) -> DataFrame:
    """Corpus-level n-gram frequency table: the top-k n-grams per group
    (language, domain, ...) with total occurrence count and document
    frequency — the LM-statistics / contamination-screening view of a
    corpus, where per-document signals (``repetition_features``) look at
    one doc at a time.

    Returns ``(group_col, ngram, cnt, doc_freq, rank <= k)`` ordered by
    (cnt DESC, ngram ASC) within each group.

    Scale shape: one posexplode (pre-spread), n-1 ``lead`` windows keyed
    by doc (dense, bounded by doc length), then a two-level aggregate —
    (group, ngram, doc) partial-combines map-side before the (group,
    ngram) rollup — so the shuffle carries distinct n-grams, not token
    instances. The top-k window runs over the aggregated table, whose
    size is vocabulary², not corpus; hot n-grams are exactly what the
    aggregation collapses.
    """
    toks = _spread(df).select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc"),
        F.posexplode(whitespace_tokens(F.col(text_col))).alias("pos", "tok"),
    )
    w_doc = Window.partitionBy("doc").orderBy("pos")
    parts = [F.col("tok")] + [
        F.lead("tok", i).over(w_doc).alias(f"_t{i}") for i in range(1, n)
    ]
    grams = toks.select("grp", "doc", *parts)
    cond = None
    for i in range(1, n):
        c = F.col(f"_t{i}").isNotNull()
        cond = c if cond is None else (cond & c)
    if cond is not None:
        grams = grams.filter(cond)
    gram = F.concat_ws(
        " ", F.col("tok"), *[F.col(f"_t{i}") for i in range(1, n)]
    )
    per_doc = grams.select("grp", "doc", gram.alias("ngram")).groupBy(
        "grp", "ngram", "doc"
    ).agg(F.count(F.lit(1)).alias("_c"))
    agg = per_doc.groupBy("grp", "ngram").agg(
        F.sum("_c").cast("long").alias("cnt"),
        F.count(F.lit(1)).cast("long").alias("doc_freq"),
    )
    w = Window.partitionBy("grp").orderBy(F.desc("cnt"), F.asc("ngram"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(F.col("grp").alias(group_col), "ngram", "cnt", "doc_freq", "rank")
    )
