"""Skew-join A/B: the same hot-key join with AQE skew splitting ON vs
OFF (VERDICT r05 ask #6 — record before/after timings in BASELINE.md).

Fixture: LEFT has one key carrying 30% of all rows (zipf-hot, the AACT
"healthy volunteers"-type shape); RIGHT is a uniform dim too large to
broadcast (forced SMJ). With splitting OFF the hot partition funnels
through one reducer; ON, AQE splits it across tasks. Thresholds are
lowered to make the default 256 MB skew bar trigger at local scale —
the mechanism under test is the split, not the bar.

Usage: python scripts/bench_skew_join.py [--rows 20000000]
Prints one JSON line per mode plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clinical_trials_data_pipeline_analyis_spark.session import get_spark


def run(spark, n_rows: int, skew_on: bool) -> tuple[float, int]:
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
    left = spark.range(0, n_rows, 1, 32).select(
        F.when(F.col("id") % 10 < 5, F.lit(0))
        .otherwise(F.col("id") % 100_000)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(0, 400_000, 1, 32).select(
        (F.col("id") % 100_000).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("attr"),
    )
    # The aggregate CONSUMES both payloads per joined row (xxhash over
    # the dim attribute + the fact payload): a bare count() lets
    # Catalyst prune every column and the join degenerates to a key
    # probe too cheap to expose the straggler.
    t0 = time.perf_counter()
    n = (
        left.join(right, "k")
        .select(
            F.count(F.lit(1)).alias("n"),
            # double: ANSI-safe sum of full-range hashes
            F.sum(F.xxhash64("attr", "payload").cast("double")).alias("chk"),
        )
        .collect()[0]["n"]
    )
    return time.perf_counter() - t0, n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    args = ap.parse_args()

    spark = get_spark(app_name="bench_skew_join")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")

    # warm (file-less fixture, but JIT/codegen warmup still matters)
    run(spark, 1_000_000, True)

    results = {}
    for mode in (False, True):
        sec, n = run(spark, args.rows, mode)
        results["on" if mode else "off"] = round(sec, 2)
        print(
            json.dumps(
                {
                    "mode": "skewJoin=on" if mode else "skewJoin=off",
                    "sec": round(sec, 4),
                    "rows": n,
                }
            )
        )
    print(
        json.dumps(
            {
                "metric": "skew_join_ab",
                "rows": args.rows,
                "off_sec": results["off"],
                "on_sec": results["on"],
                "speedup": round(results["off"] / results["on"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
