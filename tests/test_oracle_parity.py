"""Local mirror of the driver's correctness gate: run every registered
Spark query and its DuckDB oracle side-by-side on the same parquet tables,
compare row count, column-name set, and order-insensitive values.

Float columns are compared exactly (the suite's exact-match discipline —
decimal-exact sums + round(6) — is supposed to make both engines emit
bit-identical doubles); a tiny tolerance fallback flags anything that would
be hash-unstable under the driver.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from compare_util import compare_frames as _compare
from conftest import SF_DIR
from clinical_trials_data_pipeline_analyis_spark.sources.parquet import TESTDATA_TABLES
from clinical_trials_data_pipeline_analyis_spark.suite import registry

_REG = registry()


def _duck_run(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.execute(sql).df()


@pytest.mark.parametrize("name", sorted(_REG))
def test_query_matches_oracle(spark, name):
    reg = _REG[name]
    got = reg.spark(spark, SF_DIR).toPandas()
    if reg.oracle is None:
        assert len(got) >= 0  # rows-only contract for non-SQL-expressible ops
        return
    want = _duck_run(reg.oracle)
    _compare(name, got, want)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0


def test_every_query_has_coverage_tags():
    for name, reg in _REG.items():
        assert reg.covers, f"{name} declares no SURVEY §2 coverage"
