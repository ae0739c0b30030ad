"""Property-based tests for the round-5 operator batch: invariants that
must hold on ANY input — CMS never underestimates, retention curves are
monotone, fixed-point PageRank conserves mass and is bit-reproducible,
ordered funnels never gain users downstream."""

from __future__ import annotations

import pytest

try:
    from hypothesis import given, settings, strategies as st

    HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAS_HYPOTHESIS = False

from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(not HAS_HYPOTHESIS, reason="hypothesis missing")

_SETTINGS = dict(max_examples=8, deadline=None)


@given(
    vals=st.lists(
        st.sampled_from([f"t{i}" for i in range(12)]),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_cms_estimate_never_below_exact(spark, vals):
    from clinical_trials_data_pipeline_analyis_spark.operators.sketches import (
        cms_topk_estimates,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v STRING")
    out = cms_topk_estimates(df, "v", k=20, d=3, w=16).collect()
    import collections

    exact = collections.Counter(vals)
    assert {r["value"]: r["exact_count"] for r in out} == dict(
        collections.Counter(dict(exact.most_common(20)))
    )
    for r in out:
        assert r["cms_estimate"] >= r["exact_count"]
        assert r["overestimate"] == r["cms_estimate"] - r["exact_count"]


@given(
    rows=st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_retention_curve_monotone(spark, rows):
    from clinical_trials_data_pipeline_analyis_spark.operators.curation import (
        retention_curve,
    )

    df = spark.createDataFrame(
        [(i, s, w) for i, (s, w) in enumerate(rows)],
        "id BIGINT, q DOUBLE, w BIGINT",
    )
    out = sorted(
        retention_curve(df, "q", "w", bins=10).collect(),
        key=lambda r: r["threshold_bp"],
    )
    assert out, "non-empty input must produce a curve"
    # docs/weight retained never increase as the threshold rises, and
    # the lowest present threshold retains everything.
    docs = [r["docs_retained"] for r in out]
    wts = [r["weight_retained"] for r in out]
    assert docs == sorted(docs, reverse=True)
    assert wts == sorted(wts, reverse=True)
    assert docs[0] == len(rows)
    assert wts[0] == sum(w for _, w in rows)
    for r in out:
        assert 0.0 <= r["docs_frac"] <= 1.0
        # NULL weight_frac iff the corpus carries zero total weight
        if sum(w for _, w in rows) == 0:
            assert r["weight_frac"] is None
        else:
            assert 0.0 <= r["weight_frac"] <= 1.0


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_pagerank_conserves_mass_and_is_reproducible(spark, edges):
    from clinical_trials_data_pipeline_analyis_spark.operators.graph import (
        PAGERANK_SCALE,
        pagerank_fixed_point,
    )

    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    out = pagerank_fixed_point(df, iterations=3).collect()
    nodes = {n for e in edges for n in e}
    assert {r["node"] for r in out} == nodes
    total = sum(r["rank_ppb"] for r in out)
    # every DIV loses < 1 unit; with <= 13 nodes and 3 iterations the
    # truncation deficit is bounded far under 1% of the mass.
    assert PAGERANK_SCALE * 0.99 <= total <= PAGERANK_SCALE
    assert all(r["rank_ppb"] > 0 for r in out)
    # bit-reproducible: a second run returns the identical ranking.
    again = pagerank_fixed_point(df, iterations=3).collect()
    assert {(r["node"], r["rank_ppb"]) for r in again} == {
        (r["node"], r["rank_ppb"]) for r in out
    }


@given(
    log=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),            # user
            st.sampled_from(["view", "click", "purchase"]),   # step
            st.integers(min_value=0, max_value=50),           # minute
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_funnel_counts_never_increase_downstream(spark, log):
    import datetime as dt

    from clinical_trials_data_pipeline_analyis_spark.operators.events import (
        funnel_counts,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (u, s, t0 + dt.timedelta(minutes=m)) for (u, s, m) in log
    ]
    ev = spark.createDataFrame(
        rows, "user_id BIGINT, event_type STRING, ts TIMESTAMP_NTZ"
    )
    out = {
        r["step"]: r["users"]
        for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()
    }
    assert out[1] >= out[2] >= out[3] >= 0
    viewers = {u for (u, s, _) in log if s == "view"}
    assert out[1] == len(viewers)
