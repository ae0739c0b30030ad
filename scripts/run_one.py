"""Run ONE registered query at an arbitrary sf dir in a fresh process.

The generic fresh-process retime leg for whole-suite scale sweeps
(testdata_sf1 and the driver SFs) — `bench_corpus_sf10.py --names` only
covers the corpus family and hard-assumes the sf10 corpus row counts,
so `adjudicate_sweep.py --runner suite` shells out to this instead.
Mirrors bench.py's measurement hygiene: same warms (parquet footers +
Arrow worker spinup), same deterministic JVM calib workload, one timed
`.count()`.

The timing is BEST-OF-2 — the same method as bench.py's in-suite
`_solo_time` adjudicator. A fresh JVM's FIRST heavy run measures
JIT/whole-stage-codegen/classloading warmup, not the query: measured
on the 100x relational rung, q09_window_dedup runs 38.0s / 7.8s /
4.6s on consecutive executions in one fresh process (the in-sweep
value, 9.5s, sits right at the warm level because earlier sweep
queries had warmed the scan path). A single cold run is a different
metric (one-shot-job latency) and must not be filed against warm-JVM
sweep rows.

Usage: python scripts/run_one.py NAME --sf-dir DIR [--out OUT.json]
Prints/writes {"queries": {NAME: sec}, "calib_sec": c} — the same shape
adjudicate_sweep.py merges from.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    # Same per-thread memory sizing as the corpus sweeps: 32 task
    # threads over 10x frames outgrow get_spark's 8g default.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

    from clinical_trials_data_pipeline_analyis_spark.session import get_spark
    from clinical_trials_data_pipeline_analyis_spark.suite import spark_queries

    spark = get_spark(app_name=f"run-one-{args.name}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()
    if args.name not in qs:
        raise SystemExit(f"unknown query {args.name!r}")

    # warm: session + file listing (cheapest registered query) + Arrow
    qs["x01_dedup_exact"](spark, args.sf_dir).count()
    spark.range(0, 1024, 1, 32).mapInPandas(lambda it: it, "id long").count()

    c0 = time.perf_counter()
    spark.range(0, 200_000_000, 1, 32).selectExpr(
        "sum(cast(xxhash64(id) as double)) as s"
    ).collect()
    calib_sec = round(time.perf_counter() - c0, 4)

    runs: list[float] = []
    n = 0
    for _ in range(2):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        n = qs[args.name](spark, args.sf_dir).count()
        runs.append(round(time.perf_counter() - t0, 4))
    sec = min(runs)

    result = {
        "queries": {args.name: sec},
        "calib_sec": calib_sec,
        "rows": {args.name: n},
        "runs": runs,
        "sf_dir": args.sf_dir,
    }
    line = json.dumps(result)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line)
    print(line)


if __name__ == "__main__":
    main()
