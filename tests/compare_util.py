"""Shared Spark-vs-DuckDB frame comparison, mirroring the driver's
order-insensitive, column-name-sorted, value-exact hash compare."""

from __future__ import annotations

import math

import pandas as pd
import pytest


def _norm_value(v):
    if v is None or v != v:  # None / NaN / NaT
        return None
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if hasattr(v, "time") and callable(getattr(v, "time", None)):
        # datetime: collapse midnight to a bare date string so Spark
        # datetime.date vs DuckDB datetime64 agree.
        try:
            if v.time() == __import__("datetime").time(0, 0):
                return v.date().isoformat()
            return v.isoformat(sep=" ")
        except Exception:
            pass
    return str(v)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s) or s.dtype == object:
            df[c] = s.map(_norm_value)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare_frames(name: str, got: pd.DataFrame, want: pd.DataFrame) -> None:
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    g, w = normalize(got), normalize(want)
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
                    not math.isnan(a)
                    and not math.isnan(b)
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
