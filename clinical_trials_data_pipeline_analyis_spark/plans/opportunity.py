"""The flagship weighted "white space" opportunity-scoring query.

Mirrors ``aact_gold_layer.sql:260-349`` — a 5-stage CTE DAG:

1. trial_priority (:264-275): best intervention priority per trial,
   MIN over a case-insensitive type ranking (drug/biological=1,
   dietary supplement=2, else 3).
2. relevant_trials (:278-290): interventional trials with priority <= 2,
   NULL-guarded via COALESCE(best_priority, 99).
3. condition_metrics (:293-308): per-(condition, area) counts and the
   recent/older momentum cohorts.
4. condition_sponsors (:311-325): SEPARATE distinct-industry-sponsor
   aggregation (N9 — merging it into (3) would inflate total_trials).
5. final (:328-349): LEFT JOIN the aggregates, weighted score
   0.4/0.3/0.2/0.1 with the N7 degeneracies (relevance term constant by
   construction; momentum can be negative; 0 when both cohorts empty),
   then the >10-trials / excluded-area / '%healthy%' filters.

Scale shape: the relevant set is filtered BEFORE the condition fan-out
join; both aggregations shuffle once on their own keys; the final join is
condition-cardinality (small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig


def trial_priority(silver_interventions: DataFrame) -> DataFrame:
    it = F.lower(F.col("intervention_type"))
    return silver_interventions.groupBy("nct_id").agg(
        F.min(
            F.when(it.isin("drug", "biological"), 1)
            .when(it == "dietary supplement", 2)
            .otherwise(3)
        ).alias("best_priority")
    )


def relevant_trials(
    silver_studies: DataFrame, trial_priority_df: DataFrame
) -> DataFrame:
    s = silver_studies.alias("s")
    tp = trial_priority_df.alias("tp")
    return (
        s.join(tp, F.col("s.nct_id") == F.col("tp.nct_id"), "left")
        .filter(
            (F.coalesce(F.col("tp.best_priority"), F.lit(99)) <= 2)
            & (F.col("s.study_type") == "INTERVENTIONAL")
        )
        .select(
            F.col("s.nct_id").alias("nct_id"),
            F.col("s.phase").alias("phase"),
            F.col("s.start_date").alias("start_date"),
        )
    )


def opportunity_rank(
    silver_studies: DataFrame,
    silver_conditions: DataFrame,
    silver_interventions: DataFrame,
    silver_sponsors: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    rt = relevant_trials(silver_studies, trial_priority(silver_interventions))

    cond = silver_conditions.alias("c")
    metrics = (
        rt.alias("rt")
        .join(cond, F.col("rt.nct_id") == F.col("c.nct_id"))
        .groupBy(
            F.col("c.name").alias("condition_name"),
            F.col("c.therapeutic_area").alias("therapeutic_area"),
        )
        .agg(
            F.count("rt.nct_id").alias("total_trials"),
            F.count("rt.nct_id").alias("drug_trial_count"),
            F.sum(
                F.when(F.col("rt.phase").isin("PHASE 3", "PHASE 4"), 1).otherwise(0)
            ).alias("late_phase_count"),
            F.sum(
                F.when(
                    F.col("rt.start_date") >= F.lit(config.recent_cohort_start), 1
                ).otherwise(0)
            ).alias("recent_trials"),
            F.sum(
                F.when(
                    F.col("rt.start_date").between(
                        F.lit(config.older_cohort_start),
                        F.lit(config.older_cohort_end),
                    ),
                    1,
                ).otherwise(0)
            ).alias("older_trials"),
        )
    )

    spon = silver_sponsors.alias("spon")
    cond2 = silver_conditions.alias("c2")
    sponsors = (
        rt.alias("rt2")
        .join(cond2, F.col("rt2.nct_id") == F.col("c2.nct_id"))
        .join(spon, F.col("rt2.nct_id") == F.col("spon.nct_id"))
        .filter(F.col("spon.sponsor_category") == "Industry")
        .groupBy(F.col("c2.name").alias("condition_name"))
        .agg(
            F.countDistinct("spon.clean_sponsor_name").alias(
                "industry_sponsor_count"
            )
        )
    )

    cm = metrics.alias("cm")
    cs = sponsors.alias("cs")
    momentum = (
        F.when(
            (F.col("older_trials") == 0) & (F.col("recent_trials") > 0), F.lit(1.0)
        )
        .when(
            F.col("older_trials") > 0,
            (F.col("recent_trials").cast("double") - F.col("older_trials"))
            / F.col("older_trials"),
        )
        .otherwise(F.lit(0.0))
    )
    score = (
        (
            F.coalesce(F.col("drug_trial_count"), F.lit(0))
            * F.lit(1.0)
            / F.col("total_trials")
        )
        * config.weight_relevance
        + (
            F.lit(1.0)
            / (1 + F.coalesce(F.col("industry_sponsor_count"), F.lit(0)))
        )
        * config.weight_competition
        + (F.lit(1.0) / (1 + F.coalesce(F.col("late_phase_count"), F.lit(0))))
        * config.weight_saturation
        + momentum * config.weight_momentum
    )
    return (
        cm.join(
            cs, F.col("cm.condition_name") == F.col("cs.condition_name"), "left"
        )
        .filter(
            (F.col("total_trials") > config.min_trials_for_score)
            & (~F.col("therapeutic_area").isin(*config.excluded_areas))
            & (~F.col("cm.condition_name").ilike("%healthy%"))
        )
        .select(
            F.col("cm.condition_name").alias("condition_name"),
            "therapeutic_area",
            "total_trials",
            score.alias("opportunity_score"),
        )
    )
