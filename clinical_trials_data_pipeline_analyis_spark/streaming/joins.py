"""Watermarked stream-stream joins (event attribution).

The remaining canonical Structured Streaming shape after windowed aggs,
sessionization, and bounded-state dedup: join two live event streams on
a key plus a time-interval condition — "attribute each action to the
view events of the same user in the preceding gap window".

State-boundedness at 100 TB/day rates comes from BOTH requirements the
Spark stream-stream join planner enforces:

- a watermark on each input, so old state can be evicted, and
- a time-interval join condition (``view.ts`` in
  ``[action.ts - max_gap, action.ts]``), which tells the planner exactly
  how long a buffered row can still match: view-side state lives
  ``watermark + max_gap``, action-side state ``watermark``.

Without the interval condition the join would buffer both streams
forever — that shape is refused here rather than documented around.

The same join expression runs unchanged on batch DataFrames
(:func:`attribute_actions_batch`), which is what the stream=batch
equality test exercises.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _attribution_condition(max_gap: str) -> Column:
    return (
        (F.col("v.user_id") == F.col("a.user_id"))
        & (F.col("v.ts") <= F.col("a.ts"))
        & (F.col("v.ts") >= F.col("a.ts") - F.expr(f"INTERVAL {max_gap}"))
    )


def _project(joined: DataFrame) -> DataFrame:
    return joined.select(
        F.col("a.event_id").alias("action_event_id"),
        F.col("a.user_id").alias("user_id"),
        F.col("a.ts").alias("action_ts"),
        F.col("a.event_type").alias("action_type"),
        F.col("v.event_id").alias("view_event_id"),
        F.col("v.ts").alias("view_ts"),
        (
            F.unix_timestamp("a.ts") - F.unix_timestamp("v.ts")
        ).cast("long").alias("gap_seconds"),
    )


def attribute_actions_stream(
    views: DataFrame,
    actions: DataFrame,
    max_gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: every (action, prior view) pair of the
    same user with ``view.ts`` within ``max_gap`` before the action.

    Inner join only: stream-stream OUTER results emit when the watermark
    finally passes a buffered row, so rows near the end of input never
    emit under ``availableNow`` — an equality-with-batch trap. Callers
    who need unattributed actions should anti-join the attributed ids
    against the action stream in a downstream foreachBatch instead.

    All matches are returned (no per-action top-1: ranking windows are
    illegal downstream of a stream-stream join; run keep-latest as a
    batch window over the sink, or via applyInPandasWithState).
    """
    v = views.withWatermark("ts", watermark).alias("v")
    a = actions.withWatermark("ts", watermark).alias("a")
    return _project(v.join(a, _attribution_condition(max_gap), "inner"))


def attribute_actions_batch(
    views: DataFrame, actions: DataFrame, max_gap: str = "30 minutes"
) -> DataFrame:
    """Batch twin of :func:`attribute_actions_stream` — identical join
    expression, no watermarks (batch needs no state eviction). Used by
    the stream=batch equality test and as the backfill form."""
    v = views.alias("v")
    a = actions.alias("a")
    return _project(v.join(a, _attribution_condition(max_gap), "inner"))
