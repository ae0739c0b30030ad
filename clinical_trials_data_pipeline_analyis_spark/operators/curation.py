"""Curation funnel: ordered filter rules + per-stage drop accounting.

A production corpus release applies an ORDERED cascade of filters
(language, length, quality, repetition, dedup, decontamination) and
ships the funnel report — how many documents each stage dropped — both
for auditability and because the stage ordering is a cost strategy:
cheap row-local rules run first so expensive ones (dedup joins) see
fewer rows. Reference analog: the silver quality gate of
`aact_gold_layer.sql` (assert-and-filter before the gold build), here
generalized to N named rules with attribution.

``first_failed_rule`` attributes each document to the FIRST rule it
fails (first-fail semantics make per-stage counts additive: the funnel
sums to the corpus size). A rule is (name, boolean Column) where True
means the document FAILS; signal columns that need aggregation (e.g.
repetition stats, dup flags) are joined in by the caller beforehand, so
the verdict itself is one ordered CASE chain — row-local, zero extra
shuffles.

Scale shape: verdict = one projection over the pre-joined signal frame;
the funnel report = one groupBy on a low-cardinality stage key (#rules
+ 1 groups) — map-side combinable, never skewed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KEPT = "kept"


def first_failed_rule(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """Append ``stage`` (name of the first failing rule, or ``kept``)
    and ``is_kept`` to ``df``. Rule order is the cascade order."""
    stage = F.lit(KEPT)
    for name, fails in reversed(rules):
        stage = F.when(fails, F.lit(name)).otherwise(stage)
    return df.withColumn("stage", stage).withColumn(
        "is_kept", F.col("stage") == KEPT
    )


def curation_report(verdicts: DataFrame) -> DataFrame:
    """(stage, n_docs) — the funnel. Counts are additive over stages
    because of first-fail attribution; ``kept`` is the shipped corpus."""
    return verdicts.groupBy("stage").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


def retention_curve(
    df: DataFrame,
    score_col: str,
    weight_col: str,
    bins: int = 20,
) -> DataFrame:
    """Threshold sweep for a quality filter: for every candidate cutoff,
    how many documents and how much token mass survive ``score >= t``.

    The decision artifact behind "filter at what threshold?" — tuning a
    quality classifier's operating point means reading this curve, not
    re-running the filter per candidate value. Scores are expected in
    the [0, 1] domain (the contract for every quality score in this
    engine); out-of-range values are clamped INTO the curve rather than
    silently distorting it — score < 0 counts in the bottom bin
    (threshold 0 retains everything, by definition) and score > 1.0 in
    the top bin, symmetric GREATEST/LEAST clamps. Scores are binned to
    ``floor(score * bins)`` after clamping; each output row is one
    cutoff::

        threshold_bp = bin * 10000 / bins      -- cutoff in basis points
        docs_retained / weight_retained        -- mass with score >= cutoff
        docs_frac / weight_frac                -- as a fraction of total

    Scale shape: ONE corpus pass (map-side-combinable groupBy on the
    bin key, <= ``bins`` groups), then the descending cumulative sum and
    the totals run as windows over the <= ``bins``-row aggregate — the
    sweep over all thresholds costs exactly one scan regardless of how
    many cutoffs it evaluates. NULL scores are excluded (they carry no
    threshold information; route them through the curation funnel's
    explicit rules instead).

    Fractions are round(x, 6) on a double division of two exact BIGINT
    sums — deterministic across engines.
    """
    from pyspark.sql import Window

    binned = (
        df.filter(F.col(score_col).isNotNull())
        .groupBy(
            F.greatest(
                F.least(F.floor(F.col(score_col) * bins), F.lit(bins - 1)),
                F.lit(0),
            )
            .cast("long")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum(weight_col).cast("long").alias("weight"),
        )
    )
    w_ge = (
        Window.orderBy(F.col("bin").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        binned.select(
            "bin",
            F.sum("docs").over(w_ge).alias("docs_retained"),
            F.sum("weight").over(w_ge).alias("weight_retained"),
            F.sum("docs").over(w_tot).alias("docs_total"),
            F.sum("weight").over(w_tot).alias("weight_total"),
        )
        .select(
            (F.col("bin") * 10_000 / bins).cast("long").alias("threshold_bp"),
            "docs_retained",
            "weight_retained",
            F.round(
                F.col("docs_retained") / F.col("docs_total").cast("double"), 6
            ).alias("docs_frac"),
            # try_divide: a zero total weight (every doc weightless)
            # yields NULL instead of an ANSI DIVIDE_BY_ZERO error —
            # found by the hypothesis sweep; docs_total is >= 1
            # whenever the curve is non-empty, so plain division there.
            F.round(
                F.try_divide(
                    F.col("weight_retained"),
                    F.col("weight_total").cast("double"),
                ),
                6,
            ).alias("weight_frac"),
        )
    )
