"""Batch event analytics: ordered funnels and cohort retention.

The two reporting primitives every event warehouse ships next to
windowed aggregation (x12) and sessionization (x13):

- **Ordered funnel** — how many users reach step N of a prescribed
  event sequence, where each step must occur strictly AFTER the user's
  first occurrence of the previous step (the "ordered funnel" of
  product analytics, not a mere per-type distinct count).
- **Cohort retention** — the (signup-week x age-week) activity matrix
  behind every retention curve.

Reference analog: the reference's dashboard measures
(`README.MD:74-83` — total trials, completion rate, percent with
results) are single-cut funnels over study status; these are the
time-conditioned generalizations.

100 TB shape
------------
Funnel: one filtered aggregate per step, each keyed by user — the
step-k frame is a per-user table (|users| rows, far smaller than the
event log) and joins the step-(k+1) candidate events by user-key
equi-join; nothing re-scans more than the one step's event subset, and
all joins share the user-hash partitioning so AQE coalesces them onto
one exchange. Cohorts: day-granular distinct activity first (the only
corpus-sized aggregate), then everything is |users| / |weeks|-sized.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

#: Days between 1970-01-01 (epoch) and the Monday used as week anchor.
#: 1970-01-05 was a Monday; anchoring week buckets there makes
#: ``(epoch_day - 4) DIV 7`` a Monday-start week number, matching ISO
#: weeks for positive dates without any engine-specific week function.
_WEEK_ANCHOR_OFFSET = 4


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step, step_name, users, conv_pct): ordered-funnel conversion.

    A user counts for step k when they have an event of type
    ``steps[k]`` strictly after their first qualifying time for step
    k-1 (first step: any occurrence). ``conv_pct`` is users at step k
    over users at step 1, rounded to 6 dp.
    """
    reached: list[tuple[str, DataFrame]] = []
    prev: DataFrame | None = None
    for step in steps:
        cand = events.filter(F.col(type_col) == step).select(
            user_col, F.col(ts_col).alias("_ts")
        )
        if prev is not None:
            cand = cand.join(prev, user_col).filter(
                F.col("_ts") > F.col("_prev_ts")
            ).select(user_col, "_ts")
        cur = cand.groupBy(user_col).agg(F.min("_ts").alias("_prev_ts"))
        reached.append((step, cur))
        prev = cur
    counts = None
    for i, (step, cur) in enumerate(reached, start=1):
        row = cur.agg(F.count(F.lit(1)).cast("long").alias("users")).select(
            F.lit(i).cast("long").alias("step"),
            F.lit(step).alias("step_name"),
            "users",
        )
        counts = row if counts is None else counts.unionByName(row)
    first = counts.filter(F.col("step") == 1).select(
        F.col("users").alias("_first")
    )
    # try_divide: an empty first step (nobody fired steps[0] at all)
    # yields NULL conversion instead of an ANSI DIVIDE_BY_ZERO error —
    # found by the hypothesis sweep.
    return counts.crossJoin(F.broadcast(first)).select(
        "step",
        "step_name",
        "users",
        F.round(
            F.try_divide(F.col("users"), F.col("_first").cast("double")), 6
        ).alias("conv_pct"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week, age_weeks, active_users, cohort_size,
    retention_pct): weekly cohort-retention matrix.

    ``cohort_week`` is the Monday-anchored week number (weeks since
    1970-01-05) of the user's FIRST event; ``age_weeks`` the whole
    weeks between that first-activity day and each active day. Week
    arithmetic is integral division on epoch-day numbers — no
    engine-specific week/truncation function, so the bucketing is
    bit-identical everywhere.
    """
    epoch_day = F.datediff(
        F.col(ts_col).cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    activity = (
        events.select(F.col(user_col), epoch_day.alias("_day"))
        .distinct()
    )
    first = activity.groupBy(user_col).agg(F.min("_day").alias("_d0"))
    cohort_size = first.select(
        F.expr(f"(_d0 - {_WEEK_ANCHOR_OFFSET}) DIV 7").alias("cohort_week"),
        F.col(user_col),
    ).groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    matrix = (
        activity.join(first, user_col)
        .select(
            F.expr(f"(_d0 - {_WEEK_ANCHOR_OFFSET}) DIV 7").alias(
                "cohort_week"
            ),
            F.expr("(_day - _d0) DIV 7").alias("age_weeks"),
            F.col(user_col),
        )
        .distinct()
        .groupBy("cohort_week", "age_weeks")
        .agg(F.count(F.lit(1)).cast("long").alias("active_users"))
    )
    return matrix.join(F.broadcast(cohort_size), "cohort_week").select(
        "cohort_week",
        "age_weeks",
        "active_users",
        "cohort_size",
        F.round(
            F.col("active_users") / F.col("cohort_size").cast("double"), 6
        ).alias("retention_pct"),
    )


def daily_rolling_counts(
    events: DataFrame,
    window_days: int = 7,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(event_type, d, day_count, rolling_count, rolling_avg): daily
    event counts with a trailing ``window_days``-day RANGE-frame
    rolling sum and average per event type — the time-series smoothing
    behind every operational dashboard ("7-day moving average").

    The frame is ``RANGE BETWEEN window_days-1 PRECEDING AND CURRENT
    ROW`` over the integer day number, so days with NO events still
    weigh the average down correctly for the days that exist — a
    rows-frame would silently skip gaps and overstate the trend. The
    average divides by the fixed window width (standard trailing-MA
    semantics), rounded to 6 dp.

    Scale shape: the corpus-sized pass is the (type, day) count
    aggregate (map-side combinable); the window runs over
    |types| x |days| rows partitioned by type. Nothing else touches
    the event log.
    """
    from pyspark.sql import Window

    epoch_day = F.datediff(
        F.col(ts_col).cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    daily = (
        events.groupBy(F.col(type_col), epoch_day.alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("day_count"))
    )
    w = (
        Window.partitionBy(type_col)
        .orderBy("d")
        .rangeBetween(-(window_days - 1), Window.currentRow)
    )
    return daily.select(
        type_col,
        "d",
        "day_count",
        F.sum("day_count").over(w).cast("long").alias("rolling_count"),
        F.round(
            F.sum("day_count").over(w) / F.lit(float(window_days)), 6
        ).alias("rolling_avg"),
    )
