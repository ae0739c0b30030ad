"""BENCH harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count()-style full materialization (collect
of an aggregated / final result) so the measured time covers the whole
plan, not just plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clinical_trials_data_pipeline_analyis_spark.session import get_spark
from clinical_trials_data_pipeline_analyis_spark.suite import spark_queries

HEADLINE = [
    "q01_pricing_summary",
    "q05_best_priority_agg",
    "q06_opportunity_rank",
    "q09_window_dedup",
    "q10_star_role_playing_dates",
    "q13_percentile_caps",
    "x01_dedup_exact",
    "x03_token_count",
    "x04_text_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE
    ]

    # Warm the JVM + file listing once so per-query numbers measure the
    # query, not session startup.
    qs[names[0]](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        _ = n
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
