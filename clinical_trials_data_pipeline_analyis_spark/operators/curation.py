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
