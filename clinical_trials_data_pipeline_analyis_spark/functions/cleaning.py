"""Cleansing/conformance expression builders.

Every function returns a native ``Column`` expression — the whole silver
layer compiles to Catalyst expressions inside one whole-stage-codegen'd
projection; there are zero Python UDFs (SURVEY.md §2.7: "100% of the
compute maps to native Catalyst expressions").
"""

from __future__ import annotations

import functools
import operator
from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def ilike_any(col: Column, patterns: Sequence[str]) -> Column:
    """``col ILIKE ANY (ARRAY[p1, p2, ...])``.

    Reference usage: why_stopped categorizer
    (``aact_silver_layer.sql:195-211``) and therapeutic-area categorizer
    (``aact_silver_layer.sql:456-497``). NULL input yields NULL (never
    TRUE), matching PostgreSQL: a NULL never satisfies the branch, so it
    falls through the WHEN chain — Spark's ``ilike`` has identical NULL
    semantics, and ``OR`` of NULLs stays NULL.
    """
    return functools.reduce(operator.or_, (col.ilike(p) for p in patterns))


def first_match_category(
    col: Column,
    branches: Sequence[tuple[Sequence[str], str]],
    otherwise: Column | str,
) -> Column:
    """Ordered first-match-wins ILIKE-chain categorizer (SURVEY.md N3).

    ``branches`` is an ordered list of (patterns, label); the first branch
    whose pattern list matches wins, exactly like a SQL CASE over
    ``ILIKE ANY`` arms.
    """
    expr: Column | None = None
    for patterns, label in branches:
        cond = ilike_any(col, patterns)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    assert expr is not None, "at least one branch required"
    return expr.otherwise(
        otherwise if isinstance(otherwise, Column) else F.lit(otherwise)
    )


def null_to(col: Column, sentinel: str) -> Column:
    """NULL -> sentinel imputation (dozens of silver columns, e.g.
    ``aact_silver_layer.sql:109-137``)."""
    return F.coalesce(col, F.lit(sentinel))


def pg_bool_yes_no(
    col: Column,
    true_label: str = "Yes",
    false_label: str = "No",
    null_label: str = "Unknown",
) -> Column:
    """Decode PostgreSQL boolean-as-text ``'t'``/``'f'``/NULL
    (``aact_silver_layer.sql:238-244`` and siblings)."""
    return (
        F.when(col == "t", true_label)
        .when(col == "f", false_label)
        .otherwise(null_label)
    )


def truncate_at_comma(col: Column) -> Column:
    """Take the text before the first comma, trimmed
    (``aact_silver_layer.sql:443-452``: STRPOS + SUBSTRING composition).

    ``split_part`` returns the whole string when no comma exists, which is
    exactly the reference's ELSE branch.
    """
    return F.trim(F.split_part(col, F.lit(","), F.lit(1)))


_DURATION_UNITS: tuple[tuple[str, int], ...] = (
    ("%Day%", 1),
    ("%Week%", 7),
    ("%Month%", 30),
    ("%Year%", 365),
)


def _duration_days_raw(col: Column) -> Column:
    """Inner duration-in-days computation (``aact_silver_layer.sql:374-379``):
    strip non-numeric chars, first token, cast to int, multiply by the unit.

    ``try_cast`` reproduces the documented N4 decision: PostgreSQL would
    error on a decimal string like '1.5 Years'; we yield NULL (and the
    quality suite counts them). ILIKE '%Day%' already matches '...Days...'
    so the reference's redundant plural arms collapse without changing
    semantics.
    """
    number = F.split_part(
        F.regexp_replace(col, r"[^0-9.]", ""), F.lit(" "), F.lit(1)
    ).try_cast("int")
    expr: Column | None = None
    for pattern, factor in _DURATION_UNITS:
        cond = col.ilike(pattern)
        value = number * factor
        expr = F.when(cond, value) if expr is None else expr.when(cond, value)
    return expr.otherwise(F.lit(None).cast("int"))


def parse_duration_days(col: Column, cap: int = 10_950) -> Column:
    """Free-text duration -> capped days (``aact_silver_layer.sql:370-391``)."""
    raw = _duration_days_raw(col)
    return F.when(raw > cap, F.lit(cap)).otherwise(raw)


def duration_flag(col: Column, cap: int = 10_950) -> Column:
    """'Not Provided' / 'Capped Outlier' / 'Actual'
    (``aact_silver_layer.sql:394-406``)."""
    raw = _duration_days_raw(col)
    return (
        F.when(col.isNull(), "Not Provided")
        .when(raw > cap, "Capped Outlier")
        .otherwise("Actual")
    )


def cap_value(col: Column, cap: int | float) -> Column:
    """Cap-at-constant (enrollment caps ``aact_silver_layer.sql:162-167``)."""
    return F.when(col > cap, F.lit(cap)).otherwise(col)
