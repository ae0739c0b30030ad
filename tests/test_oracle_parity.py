"""Local mirror of the driver's correctness gate: run every registered
Spark query and its DuckDB oracle side-by-side on the same parquet tables,
compare row count, column-name set, and order-insensitive values.

Float columns are compared exactly (the suite's exact-match discipline —
decimal-exact sums + round(6) — is supposed to make both engines emit
bit-identical doubles); a tiny tolerance fallback flags anything that would
be hash-unstable under the driver.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

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


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: str(v) if v is not None and v == v else None
            )
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> None:
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    g, w = _normalize(got), _normalize(want)
    for c in g.columns:
        gs, ws = g[c], w[c]
        if pd.api.types.is_float_dtype(gs) or pd.api.types.is_float_dtype(ws):
            gsf = gs.astype(float)
            wsf = ws.astype(float)
            both_nan = gsf.isna() & wsf.isna()
            exact = (gsf == wsf) | both_nan
            if not exact.all():
                bad = (~exact).idxmax()
                a, b = gsf[bad], wsf[bad]
                assert (
                    not math.isnan(a) and not math.isnan(b)
                    and abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
                ), f"{name}.{c}: value mismatch at row {bad}: {a!r} vs {b!r}"
                pytest.fail(
                    f"{name}.{c}: within tolerance but not bit-exact at row "
                    f"{bad}: {a!r} vs {b!r} — would be hash-unstable"
                )
        else:
            eq = (gs == ws) | (gs.isna() & ws.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                raise AssertionError(
                    f"{name}.{c}: mismatch at row {bad}: {gs[bad]!r} vs {ws[bad]!r}"
                )


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
