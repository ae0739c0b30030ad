"""Dashboard measures over the gold star schema (SURVEY §2.5 / M6).

The reference's Power BI model defines these as DAX measures
(``media/star_schema.png``: "Total Active Trials", "Total Enrollment",
"Average Trial Duration", "Late-Phase Trial Count", "Count of early
trials", YoY growth via the date dimension, ``README.MD:74``). Here they
are ordinary Spark aggregate queries over fact_trials + dims — the gold
layer is the pre-aggregation, so these are cheap interactive queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def headline_measures(fact: DataFrame, dim_studies: DataFrame) -> DataFrame:
    """One-row KPI set: totals and averages over the fact grain."""
    f = fact.alias("f")
    d = dim_studies.select("study_key", "overall_status", "phase").alias("d")
    joined = f.join(F.broadcast(d), "study_key", "left")
    return joined.agg(
        F.count(F.lit(1)).alias("total_trials"),
        F.sum("enrollment").cast("long").alias("total_enrollment"),
        F.sum(F.when(F.col("overall_status") == "Active", 1).otherwise(0)).alias(
            "total_active_trials"
        ),
        F.sum(
            F.when(F.col("phase").isin("PHASE 3", "PHASE 4"), 1).otherwise(0)
        ).alias("late_phase_trial_count"),
        F.sum(
            F.when(F.col("phase").isin("PHASE 1", "PHASE 2"), 1).otherwise(0)
        ).alias("early_phase_trial_count"),
        F.round(
            F.sum(F.col("target_duration_days").cast("decimal(18,4)")).cast(
                "double"
            )
            / F.count("target_duration_days"),
            6,
        ).alias("avg_trial_duration_days"),
    )


def trials_per_year(fact: DataFrame, dim_dates: DataFrame) -> DataFrame:
    """Trial starts per calendar year via the date dimension (role:
    start_date_key); default-member rows (key 0) are excluded."""
    dd = dim_dates.select("date_key", "year").alias("dd")
    return (
        fact.filter(F.col("start_date_key") != 0)
        .join(F.broadcast(dd), fact.start_date_key == F.col("dd.date_key"))
        .groupBy("year")
        .agg(
            F.count(F.lit(1)).alias("n_trials"),
            F.sum("enrollment").cast("long").alias("year_enrollment"),
        )
    )


def yoy_growth(fact: DataFrame, dim_dates: DataFrame) -> DataFrame:
    """Year-over-year growth of trial starts — the Power BI
    time-intelligence measure as a lag window over the yearly rollup."""
    per_year = trials_per_year(fact, dim_dates)
    w = Window.orderBy("year")
    prev = F.lag("n_trials").over(w)
    return per_year.select(
        "year",
        "n_trials",
        prev.alias("prev_year_trials"),
        F.round(
            F.when(
                prev.isNotNull() & (prev > 0),
                (F.col("n_trials") - prev) / prev.cast("double"),
            ),
            6,
        ).alias("yoy_growth"),
    )
