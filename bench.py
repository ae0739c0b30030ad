"""BENCH harness: runs the registered queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Emission contract (the driver captures only the last ~2,000 chars of
stdout and parses the FINAL line as JSON, so the summary must be small):

- one verbose JSON line per query as it finishes:
  {"query": full_name, "sec": t, "rows": n}  — these are for
  humans / logs (``rows`` is the materialized count);
- the full-name timing map is also written to ``bench_full.json``
  next to this script;
- the LAST stdout line is ONE compact JSON summary
  {"metric":"suite_wall_clock","value":total,"unit":"sec",
   "queries":{short: sec},"sf":...}
  where ``short`` is the query-id prefix (e.g. ``a21``, ``q06``,
  ``x05``) — unique across the suite and ~12 bytes per entry, keeping
  the line well under the tail-capture limit at 78+ queries. If the
  line would still exceed the limit, the "queries" map is dropped and
  "queries_truncated": true marks the omission (full map remains in
  ``bench_full.json``).

Each query is executed with a count()-style full materialization so the
measured time covers the whole plan, not just plan construction.

The summary also carries ``calib_sec`` — a fixed deterministic JVM-side
workload timed each run (xxhash64 sum over range(200M), codegen-only,
no I/O). Dividing per-query times by the ratio of two runs' calib_sec
normalizes away host-speed differences between rounds (round 5 ran on
a ~1.4x slower host than round 4; see BASELINE.md).
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


def short_id(name: str) -> str:
    """Query-id prefix before the first underscore (a21, q06, x05)."""
    return name.split("_", 1)[0]


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
    # Warm the Python-worker/Arrow path too: the first mapInPandas in
    # run order otherwise pays the one-time worker spinup (~1.5s) — in
    # round 3 that single artifact put a27 4.3x over its baseline while
    # the operator itself was unchanged.
    spark.range(0, 1024, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).count()
    # NO full-suite warm pass. Round 8 briefly ran every query once at
    # sf0.001 before the timed pass (to absorb the then-flat-codegen
    # path's per-shape compile cost); measured A/B on a quiet host, that
    # pass INFLATED the timed rows it was meant to clean — 120 queries'
    # worth of generated classes, metaspace, and broadcast state front-
    # loaded into the JVM made mid-suite CPU-bound queries 2-5x slower
    # (a31 22.5s with the warm pass vs 5.2s without; a32 10.0 vs 1.8;
    # even the scan-light a42 0.80 vs 0.36), swamping the ~1s compile
    # constant it saved. The flat path is gone (functions/vectors.py)
    # and with it the motivation; the two targeted warms above are
    # sufficient and measurably neutral.

    # Host-speed calibration: a fixed, deterministic, JVM-side workload
    # (xxhash64 over spark.range, whole-stage codegen, no I/O) timed on
    # every bench run. Per-query times divide by (calib_sec / its value
    # on the round-4 reference host) to compare across hosts: round 5
    # observed IDENTICAL CODE running a uniform ~1.4x slower than the
    # round-4 driver bench purely from a slower machine, which per-query
    # rows alone cannot distinguish from a regression.
    c0 = time.perf_counter()
    spark.range(0, 200_000_000, 1, 32).selectExpr(
        "sum(cast(xxhash64(id) as double)) as s"  # double: ANSI-safe sum
    ).collect()
    calib_sec = round(time.perf_counter() - c0, 4)

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(json.dumps({"query": name, "sec": timings[name], "rows": n}))
        # Measurement hygiene, OUTSIDE the timed window: 90+ queries in
        # one long-lived local[] JVM accumulate broadcast blocks /
        # shuffle state / codegen classes, and once the old gen fills,
        # concurrent-GC storms inflate late CPU-bound queries up to 10x
        # (measured round 5: x16 12.3s in-suite vs 1.7s with a quiet
        # heap, identical code). An explicit collection between queries
        # makes each row measure the query, not its predecessors' heap.
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    total = round(sum(timings.values()), 4)

    full = {
        "metric": "suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "calib_sec": calib_sec,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    out_json = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT", os.path.join(here, "bench_full.json")
    )
    with open(out_json, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)

    compact = dict(full)
    compact["queries"] = {
        short_id(n): round(t, 3) for n, t in timings.items()
    }
    line = json.dumps(compact, separators=(",", ":"))
    # Hard guard: the driver tail-captures ~2,000 chars; never exceed it.
    if len(line) > 1900:
        compact.pop("queries")
        compact["queries_truncated"] = True
        line = json.dumps(compact, separators=(",", ":"))
        print(
            "bench: compact summary exceeded 1900 chars; per-query map "
            "dropped from the final line (see bench_full.json)",
            file=sys.stderr,
        )
    sys.stdout.flush()
    print(line)


if __name__ == "__main__":
    main()
