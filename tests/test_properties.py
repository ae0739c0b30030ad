"""Property-based tests (SURVEY §5 item 4) for the tricky scalar
functions: the free-text duration parser, the first-match-wins ILIKE
chains, and the pg-boolean decoder.

Strategy: generate adversarial inputs with hypothesis, evaluate the
Catalyst expressions via a single-row DataFrame batch (one Spark job per
example set, not per example), and check the algebraic properties the
reference's semantics guarantee.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import given, settings, strategies as st

    HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAS_HYPOTHESIS = False

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from clinical_trials_data_pipeline_analyis_spark.functions.cleaning import (
    duration_flag,
    first_match_category,
    parse_duration_days,
    pg_bool_yes_no,
)
from clinical_trials_data_pipeline_analyis_spark.plans.silver import (
    WHY_STOPPED_BRANCHES,
)

pytestmark = pytest.mark.skipif(not HAS_HYPOTHESIS, reason="hypothesis missing")

_SCHEMA = StructType([StructField("s", StringType(), True)])


def _eval(spark, values, expr):
    df = spark.createDataFrame([(v,) for v in values], _SCHEMA)
    return [r["out"] for r in df.select(expr.alias("out")).collect()]


_UNIT_FACTOR = {"Days": 1, "Weeks": 7, "Months": 30, "Years": 365}


def test_duration_parser_properties(spark):
    """Well-formed 'N <Unit>' strings parse to N*factor capped at 10950;
    decimal numbers yield NULL (N4); unitless strings yield NULL."""
    cases, expected = [], []
    for n in [0, 1, 9, 29, 30, 31, 364, 10950, 10951, 99999]:
        for unit, factor in _UNIT_FACTOR.items():
            cases.append(f"{n} {unit}")
            expected.append(min(n * factor, 10950))
    cases += ["1.5 Years", "2.0 Months", "Years", "10 Fortnights", None]
    expected += [None, None, None, None, None]
    got = _eval(spark, cases, parse_duration_days(F.col("s")))
    assert got == expected

    flags = _eval(spark, cases, duration_flag(F.col("s")))
    for case, value, flag in zip(cases, expected, flags):
        if case is None:
            assert flag == "Not Provided"
        elif value == 10950 and case.split()[0].isdigit() and int(
            case.split()[0]
        ) * _UNIT_FACTOR[case.split()[1]] > 10950:
            assert flag == "Capped Outlier"
        else:
            assert flag == "Actual"


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="abcdefghij FUNDstopRECRUITsafety-",
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_why_stopped_chain_first_match_wins(spark, texts):
    """For every input, the produced label equals the label of the FIRST
    branch whose pattern list matches (case-insensitive substring), which
    is the reference's CASE-chain contract (N3)."""
    chain = first_match_category(F.col("s"), WHY_STOPPED_BRANCHES, "Other")
    got = _eval(spark, texts, chain)

    def reference_label(text: str) -> str:
        low = text.lower()
        for patterns, label in WHY_STOPPED_BRANCHES:
            if any(p.strip("%").lower() in low for p in patterns):
                return label
        return "Other"

    assert got == [reference_label(t) for t in texts]


def test_pg_bool_total_mapping(spark):
    """'t'->Yes, 'f'->No, everything else (NULL, '', 'T', 'true', junk)
    -> Unknown. The decode is total and case-sensitive like the
    reference."""
    cases = ["t", "f", None, "", "T", "F", "true", "false", " t", "yes"]
    got = _eval(spark, cases, pg_bool_yes_no(F.col("s")))
    assert got == [
        "Yes", "No", "Unknown", "Unknown", "Unknown", "Unknown",
        "Unknown", "Unknown", "Unknown", "Unknown",
    ]
