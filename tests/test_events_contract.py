"""Events-fixture type-contract canary (VERDICT r03 ask #7).

x12/x13/x18 have been rewritten twice for driver testdata type changes
(TIMESTAMP(NANOS) -> epoch-long, then TIMESTAMP(MICROS) -> NTZ). These
assertions pin the physical type and column contract the queries now
assume — if the driver regenerates events.parquet with a different
timestamp representation, THIS file fails with an explicit message
instead of three opaque value-hash mismatches.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from conftest import SF_DIR
from clinical_trials_data_pipeline_analyis_spark.suite.extensions import (
    _read_events,
)

_EXPECTED_PHYSICAL = {
    "event_id": pa.int64(),
    "ts": pa.timestamp("us"),  # MICROS, NO timezone -> NTZ semantics
    "user_id": pa.int64(),
    "event_type": pa.string(),
    "value": pa.float64(),
    "props": pa.string(),
}


def test_events_parquet_physical_types():
    schema = pq.read_schema(f"{SF_DIR}/events.parquet")
    for name, want in _EXPECTED_PHYSICAL.items():
        assert name in schema.names, (
            f"events.parquet lost column {name!r} — the driver fixture "
            f"changed; x12/x13/x18 and their oracles must be revisited"
        )
        got = schema.field(name).type
        assert got == want, (
            f"events.parquet column {name!r} is {got}, expected {want} — "
            f"the driver fixture's type changed (third time: NANOS -> "
            f"MICROS so far); update _read_events/_EVENTS_SCHEMA and "
            f"re-check x12/x13/x18 semantics + oracles"
        )
    assert getattr(schema.field("ts").type, "tz", None) is None, (
        "events.ts gained a timezone — NTZ wall-clock semantics in "
        "x12/x13/x18 no longer hold"
    )


def test_read_events_yields_ntz(spark):
    df = _read_events(spark, SF_DIR)
    ts_type = dict(df.dtypes)["ts"]
    assert ts_type == "timestamp_ntz", (
        f"_read_events returned ts as {ts_type}; x12/x13/x18 assume "
        f"timezone-free TIMESTAMP_NTZ"
    )


def test_read_events_pins_ntz_even_without_inference(spark):
    """The explicit schema must hold even if a driver session disables
    spark.sql.parquet.inferTimestampNTZ.enabled (the ADVICE r03 risk)."""
    key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        ts_type = dict(_read_events(spark, SF_DIR).dtypes)["ts"]
        assert ts_type == "timestamp_ntz"
    finally:
        spark.conf.set(key, old)
