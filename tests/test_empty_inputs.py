"""Degenerate-corpus sweep: every registered query must run (typically
to an empty result) against fully EMPTY input tables.

Empty partitions, empty aggregates, and zero denominators are exactly
what a 100 TB pipeline hits on a fresh ingest, a fully-filtered
partition, or a dry benchmark — and Spark 4's ANSI mode turns every
unguarded division or malformed literal into a runtime error. This
sweep found two real bugs when introduced (an untyped empty map literal
in the scalable surrogate-key offset, the retention/funnel zero
denominators found by the sibling hypothesis sweep).
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from clinical_trials_data_pipeline_analyis_spark.suite import spark_queries
from conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: Queries whose documented contract REJECTS an empty corpus with an
#: explicit error (preferable to silently wrong output):
#: - a50 collects the centroid list into a plan literal and
#:   ``nearest_centroid_expr`` raises on an empty index — assignment
#:   against no centroids is a caller error, loudly reported.
#: - a94 is the top-p sibling: ``topp_centroids_expr`` keeps the same
#:   empty-index contract.
_EXPECTED_RAISES = {
    "a50_cell_assign_rowlocal": ValueError,
    "a94_cell_assign_topp_rowlocal": ValueError,
}


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        tbl = pq.read_table(f"{SF_DIR}/{t}.parquet")
        pq.write_table(tbl.slice(0, 0), str(d / f"{t}.parquet"))
    return str(d)


def test_every_query_survives_an_empty_corpus(spark, empty_dir):
    failures = []
    for name, fn in spark_queries().items():
        expected = _EXPECTED_RAISES.get(name)
        try:
            fn(spark, empty_dir).count()
            if expected is not None:
                failures.append((name, f"expected {expected.__name__}"))
        except Exception as e:  # noqa: BLE001
            if expected is None or not isinstance(e, expected):
                failures.append(
                    (name, f"{type(e).__name__}: {str(e).splitlines()[0][:120]}")
                )
    assert not failures, failures


@pytest.fixture(scope="module")
def nulls_dir(tmp_path_factory):
    """Three rows per table, key columns populated, every other
    nullable column NULL — the missing-media / absent-text shape real
    ingests produce."""
    import pyarrow as pa

    keys = {
        "doc_id", "vec_id", "event_id", "l_orderkey", "o_orderkey",
        "c_custkey", "s_suppkey", "p_partkey", "n_nationkey",
        "r_regionkey", "user_id",
    }
    d = tmp_path_factory.mktemp("sf_nulls")
    for t in TABLES:
        tbl = pq.read_table(f"{SF_DIR}/{t}.parquet")
        n = 3
        cols = {
            f.name: (
                pa.array(range(n), f.type)
                if f.name in keys
                else pa.array([None] * n, f.type)
            )
            for f in tbl.schema
        }
        pq.write_table(
            pa.table(cols, schema=tbl.schema), str(d / f"{t}.parquet")
        )
    return str(d)


def test_every_query_survives_all_null_columns(spark, nulls_dir):
    """NULL payloads/texts/embeddings must flow through as NULL outputs
    (or vanish from token-derived aggregates), never crash — found the
    multimodal decode stages calling len(None) when introduced."""
    failures = []
    for name, fn in spark_queries().items():
        expected = _EXPECTED_RAISES.get(name)
        try:
            fn(spark, nulls_dir).count()
            if expected is not None:
                failures.append((name, f"expected {expected.__name__}"))
        except Exception as e:  # noqa: BLE001
            if expected is None or not isinstance(e, expected):
                failures.append(
                    (name, f"{type(e).__name__}: {str(e).splitlines()[0][:120]}")
                )
    assert not failures, failures
