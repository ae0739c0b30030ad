"""Gold layer: star schema — dims, fact, bridges.

Mirrors ``aact_gold_layer.sql``:
- dim_studies (:25-46), dim_sponsors (:63-80), dim_dates (:92-125),
  dim_conditions (:135-149), dim_interventions (:158-174)
- fact_trials (:182-204) with the role-playing date dimension (J4) and
  COALESCE(date_key, 0) default member (N8)
- bridge tables (:213-252) resolving the many-to-many trial<->entity links

Surrogate keys use the exact global row_number over the DISTINCT-reduced
entity list (dims are small by construction; the scalable variant lives in
operators/surrogate_keys.py for outsized dims).

PK constraints (:45-46 etc.) have no Spark equivalent; they're enforced as
uniqueness assertions in plans/quality.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..operators.datespine import date_spine
from ..operators.surrogate_keys import surrogate_key_exact


def dim_studies(silver_studies: DataFrame) -> DataFrame:
    """aact_gold_layer.sql:25-42 — descriptive attributes, one row per trial."""
    base = silver_studies.select(
        "nct_id",
        "brief_title",
        "official_title",
        "acronym",
        "study_type",
        "limitations_and_caveats",
        "overall_status",
        "phase",
        "why_stopped",
        "why_stopped_category",
        "has_dmc",
        "is_fda_regulated_drug",
        "is_fda_regulated_device",
        "patient_registry",
    )
    return surrogate_key_exact(base, "study_key", ["nct_id"])


def dim_sponsors(silver_sponsors: DataFrame) -> DataFrame:
    """aact_gold_layer.sql:63-76 — DISTINCT entity list + surrogate key."""
    distinct = (
        silver_sponsors.select(
            F.col("clean_sponsor_name").alias("sponsor_name"), "sponsor_category"
        )
        .distinct()
    )
    return surrogate_key_exact(
        distinct, "sponsor_key", ["sponsor_name", "sponsor_category"]
    )


def dim_conditions(silver_conditions: DataFrame) -> DataFrame:
    """aact_gold_layer.sql:135-145."""
    distinct = silver_conditions.select(
        F.col("name").alias("condition_name")
    ).distinct()
    return surrogate_key_exact(distinct, "condition_key", ["condition_name"])


def dim_interventions(silver_interventions: DataFrame) -> DataFrame:
    """aact_gold_layer.sql:158-170."""
    distinct = (
        silver_interventions.select(
            F.col("name").alias("intervention_name"), "intervention_type"
        )
        .distinct()
    )
    return surrogate_key_exact(
        distinct, "intervention_key", ["intervention_name", "intervention_type"]
    )


def dim_dates(
    spark: SparkSession, config: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """aact_gold_layer.sql:92-125 — 1980-01-01..2030-12-31 spine (N10)."""
    return date_spine(spark, config.date_spine_start, config.date_spine_end)


def fact_trials(
    silver_studies: DataFrame, dim_studies_df: DataFrame, dim_dates_df: DataFrame
) -> DataFrame:
    """aact_gold_layer.sql:182-201 — measures + FK resolution.

    The date dimension joins under THREE roles (start / completion /
    primary completion); each is a broadcast join against the ~18.6k-row
    spine, and misses get the 0 default member (N8).
    """
    s = silver_studies.alias("s")
    ds = dim_studies_df.select("nct_id", "study_key").alias("ds")
    start_d = dim_dates_df.select("date_key", "full_date").alias("start_d")
    comp_d = dim_dates_df.select("date_key", "full_date").alias("comp_d")
    prim_d = dim_dates_df.select("date_key", "full_date").alias("prim_d")
    return (
        s.join(ds, F.col("s.nct_id") == F.col("ds.nct_id"), "left")
        .join(
            F.broadcast(start_d),
            F.col("s.start_date") == F.col("start_d.full_date"),
            "left",
        )
        .join(
            F.broadcast(comp_d),
            F.col("s.completion_date") == F.col("comp_d.full_date"),
            "left",
        )
        .join(
            F.broadcast(prim_d),
            F.col("s.primary_completion_date") == F.col("prim_d.full_date"),
            "left",
        )
        .select(
            F.col("s.nct_id").alias("nct_id"),
            F.col("s.enrollment").alias("enrollment"),
            F.col("s.target_duration_days").alias("target_duration_days"),
            F.col("s.number_of_participants_groups").alias(
                "number_of_participants_groups"
            ),
            F.col("ds.study_key").alias("study_key"),
            F.coalesce(F.col("start_d.date_key"), F.lit(0)).alias(
                "start_date_key"
            ),
            F.coalesce(F.col("comp_d.date_key"), F.lit(0)).alias(
                "completion_date_key"
            ),
            F.coalesce(F.col("prim_d.date_key"), F.lit(0)).alias(
                "primary_completion_date_key"
            ),
        )
    )


def bridge_trial_sponsors(
    silver_sponsors: DataFrame, dim_sponsors_df: DataFrame
) -> DataFrame:
    """aact_gold_layer.sql:215-222 — INNER JOIN on the clean name (J5).

    Joins on name alone, exactly as the reference does: a clean name that
    appears under two categories fans out to both dim rows (faithful,
    checked by the oracle test).
    """
    s = silver_sponsors.alias("s")
    d = dim_sponsors_df.alias("d")
    return s.join(
        F.broadcast(d),
        F.col("s.clean_sponsor_name") == F.col("d.sponsor_name"),
    ).select(
        F.col("s.nct_id").alias("nct_id"),
        F.col("s.lead_or_collaborator").alias("lead_or_collaborator"),
        F.col("d.sponsor_key").alias("sponsor_key"),
    )


def bridge_trial_conditions(
    silver_conditions: DataFrame, dim_conditions_df: DataFrame
) -> DataFrame:
    """aact_gold_layer.sql:232-238."""
    s = silver_conditions.alias("s")
    d = dim_conditions_df.alias("d")
    return s.join(
        F.broadcast(d), F.col("s.name") == F.col("d.condition_name")
    ).select(
        F.col("s.nct_id").alias("nct_id"),
        F.col("d.condition_key").alias("condition_key"),
    )


def bridge_trial_interventions(
    silver_interventions: DataFrame, dim_interventions_df: DataFrame
) -> DataFrame:
    """aact_gold_layer.sql:246-252 — join on name only, as the reference
    does (a name with two types fans out, faithfully)."""
    s = silver_interventions.alias("s")
    d = dim_interventions_df.alias("d")
    return s.join(
        F.broadcast(d), F.col("s.name") == F.col("d.intervention_name")
    ).select(
        F.col("s.nct_id").alias("nct_id"),
        F.col("d.intervention_key").alias("intervention_key"),
    )
