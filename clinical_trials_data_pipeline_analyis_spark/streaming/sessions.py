"""Custom stateful streaming operator: session aggregation with
``applyInPandasWithState``.

The batch engine sessionizes with a lag window (suite query
``x13_events_sessionize``); under streaming, gap-based sessions need
per-key state that outlives micro-batches. This operator keeps
(open-session start, last-seen ts, session count) per user in the state
store, emits closed sessions as it goes, and times out idle users via the
processing-time timeout so state stays bounded.

Scale: state is partitioned by user_id across the shuffle; each executor
holds only its keys' state (RocksDB state store recommended at scale).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

#: emitted row: one per CLOSED session
SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", TimestampType(), False),
        StructField("session_end", TimestampType(), False),
        StructField("n_events", LongType(), False),
    ]
)

#: state tuple: (open_start_epoch_us, last_seen_epoch_us, n_events)
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType(), True),
        StructField("last_us", LongType(), True),
        StructField("n", LongType(), True),
    ]
)

_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap


def _us(ts: pd.Timestamp) -> int:
    return int(ts.value // 1_000)


def _sessionize_group(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
            }
        )
        return

    ts_list: list[int] = []
    for pdf in batches:
        ts_list.extend(_us(t) for t in pdf["ts"])
    ts_list.sort()

    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us, last_us, n = None, None, 0

    closed: list[tuple[int, int, int]] = []
    for t in ts_list:
        if start_us is None:
            start_us, last_us, n = t, t, 1
        elif t - last_us > _GAP_US:
            closed.append((start_us, last_us, n))
            start_us, last_us, n = t, t, 1
        else:
            last_us, n = t, n + 1

    state.update((start_us, last_us, n))
    state.setTimeoutDuration(60 * 60 * 1000)  # close idle users after 1h

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [c for _, _, c in closed],
            }
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Gap-based sessions over a streaming events frame (ts: timestamp,
    user_id: long). Emits closed sessions; open sessions close on the
    1-hour idle timeout."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
