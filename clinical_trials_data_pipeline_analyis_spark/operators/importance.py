"""Data-selection importance scores (DSIR-style hashed n-gram weights).

Implements the scoring core of *Data Selection for Language Models via
Importance Resampling* (Xie et al., NeurIPS 2023): hash every token into
``B`` buckets, estimate a target-distribution / raw-distribution
log-likelihood ratio per bucket, and score each document by the sum of
its tokens' bucket log-ratios. Documents that "look like" the target
corpus get high scores; selection then keeps the top mass (or samples
proportionally — the sampling step is ``operators.sampling``).

100 TB shape
------------
One token pass builds per-(doc, bucket) counts; the bucket
distributions are a ``B``-row aggregate of that (B is a constant,
default 512 — KBs), joined back by BROADCAST. Nothing corpus-sized is
ever broadcast or collected: the only big shuffle is the
(doc_id, bucket) partial-aggregated count, bounded by
``min(corpus_tokens, n_docs * B)`` rows. The raw distribution is the
WHOLE corpus (target included), so a second "raw" corpus pass is not
needed — the standard DSIR estimator with raw = union.

Exactness discipline: the per-bucket log-ratio is rounded to 6 dp and
cast to DECIMAL(18,6); per-document scores are decimal sums of
(count x ratio) products, so they are bit-identical across engines
regardless of addition order.

Reference analog: the reference pipeline's interestingness weighting
(`aact_gold_layer.sql:300-349` opportunity_rank weighted score) is the
same move — a fixed scoring function over per-row features ranking rows
for downstream attention; DSIR is its corpus-conditioned form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from ..checkpoint import cut_lineage

from ..functions.text import normalized_text, whitespace_tokens
from .sampling import hash_bucket

#: Default hashed-feature bucket count. Real DSIR uses 10k buckets of
#: unigram+bigram features; the bucket count only trades collision bias
#: for table size and anything <= ~64k stays a broadcast no-brainer.
DSIR_BUCKETS = 512


def dsir_scores(
    docs: DataFrame,
    target_filter,
    buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize: bool = True,
) -> DataFrame:
    """Per-document DSIR importance scores against a target subset.

    ``target_filter`` is a boolean Column marking the target-domain rows
    (e.g. ``F.col("lang") == "en"``); the raw distribution is the whole
    input. Returns (doc_id, is_target, n_tokens, dsir_score) for every
    document with at least one token, where ``dsir_score`` is::

        sum_b  count_b(doc) * round(ln((t_b + 1)/(T + B)) - ln((r_b + 1)/(R + B)), 6)

    with t/r the target/raw bucket counts and T/R their totals (add-one
    smoothing over the B buckets).

    The per-(doc, bucket) count subtree feeds both the distribution
    aggregate and the scoring join; with ``materialize=True`` (default)
    it is lineage-truncated with a lazy ``localCheckpoint`` so the
    corpus is tokenized ONCE per action, not three times (scoring +
    distribution + totals). What materializes is the post-aggregation
    count table, bounded by ``min(corpus_tokens, n_docs * buckets)``
    rows. Measured on the 50k fixture: 5.2s vs 6.6s without —
    unlike ``operators.lm``, the three consumers here sit at different
    aggregation depths, where Catalyst exchange reuse recovers less
    (BASELINE.md round-5 notes).
    """
    tok_counts = (
        docs.select(
            F.col(id_col),
            target_filter.alias("is_target"),
            F.explode(
                whitespace_tokens(normalized_text(F.col(text_col)))
            ).alias("term"),
        )
        .groupBy(id_col, hash_bucket(F.col("term"), buckets).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.max("is_target").alias("is_target"),
        )
    )
    if materialize:
        tok_counts = tok_counts.transform(cut_lineage(eager=False))
    dist = tok_counts.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), F.col("cnt")).otherwise(F.lit(0)))
        .cast("long")
        .alias("t_cnt"),
        F.sum("cnt").cast("long").alias("r_cnt"),
    )
    totals = dist.agg(
        F.sum("t_cnt").cast("double").alias("t_total"),
        F.sum("r_cnt").cast("double").alias("r_total"),
    )
    b = float(buckets)
    ratio = (
        dist.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.col("t_cnt").cast("double") + F.lit(1.0))
                    / (F.col("t_total") + F.lit(b))
                )
                - F.log(
                    (F.col("r_cnt").cast("double") + F.lit(1.0))
                    / (F.col("r_total") + F.lit(b))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("log_ratio"),
        )
    )
    return (
        tok_counts.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.max("is_target").alias("is_target"),
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("log_ratio")).alias("_score_dec"),
        )
        .select(
            id_col,
            "is_target",
            "n_tokens",
            F.col("_score_dec").cast("double").alias("dsir_score"),
        )
    )


def dsir_oracle_sql(
    target_sql: str, norm_sql: str, buckets: int = DSIR_BUCKETS
) -> str:
    """DuckDB oracle for :func:`dsir_scores` over the ``documents``
    view, interpolated from the SAME bucket count so the two sides
    cannot drift. ``target_sql`` is the boolean target predicate (e.g.
    ``lang = 'en'``); ``norm_sql`` the shared normalizer fragment."""
    return f"""
WITH toks AS (
    SELECT doc_id, ({target_sql}) AS is_target,
           CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % {buckets} AS bucket
    FROM (
        SELECT doc_id, lang,
               unnest(string_split({norm_sql}, ' ')) AS t
        FROM documents
    ) WHERE t <> ''
),
tc AS (
    SELECT doc_id, bucket, MAX(is_target) AS is_target,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks GROUP BY doc_id, bucket
),
dist AS (
    SELECT bucket,
           CAST(SUM(CASE WHEN is_target THEN cnt ELSE 0 END) AS BIGINT) AS t_cnt,
           CAST(SUM(cnt) AS BIGINT) AS r_cnt
    FROM tc GROUP BY bucket
),
tot AS (
    SELECT CAST(SUM(t_cnt) AS DOUBLE) AS t_total,
           CAST(SUM(r_cnt) AS DOUBLE) AS r_total
    FROM dist
),
ratio AS (
    SELECT bucket,
           CAST(ROUND(
               ln((CAST(t_cnt AS DOUBLE) + 1.0) / (t_total + {buckets}.0))
             - ln((CAST(r_cnt AS DOUBLE) + 1.0) / (r_total + {buckets}.0)),
           6) AS DECIMAL(18,6)) AS log_ratio
    FROM dist, tot
)
SELECT tc.doc_id,
       MAX(tc.is_target) AS is_target,
       CAST(SUM(tc.cnt) AS BIGINT) AS n_tokens,
       CAST(SUM(tc.cnt * ratio.log_ratio) AS DOUBLE) AS dsir_score
FROM tc JOIN ratio USING (bucket)
GROUP BY tc.doc_id
"""
