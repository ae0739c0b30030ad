"""Streaming deduplication: at-least-once ingest -> exactly-once rows.

Every replayed/duplicated record (source retries, producer at-least-once
semantics) is dropped by key while keeping the dedup state BOUNDED: with
``dropDuplicatesWithinWatermark`` the state store only remembers keys
until the watermark passes them, so state size is arrival-rate x
watermark horizon — not stream history. This is the streaming
counterpart of the batch exact-dedup operator
(`operators.dedup.exact_duplicates`) and the ingestion guard a
continuously-fed training-data pipeline runs in front of the bronze
layer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_events_stream(
    events: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    event_time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate events by ``key_cols``, remembering keys for
    ``watermark`` of event time.

    The first arrival of a key wins; any duplicate arriving within the
    watermark horizon is discarded, and a duplicate arriving later than
    the horizon is (by contract) allowed through — that is the bounded-
    state trade-off. Choose the watermark to cover the source's maximum
    replay window.
    """
    return events.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
