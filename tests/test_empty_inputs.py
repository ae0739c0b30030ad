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
_EXPECTED_RAISES = {"a50_cell_assign_rowlocal": ValueError}


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
