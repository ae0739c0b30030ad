"""Split per-query time into CONSTRUCTION (eager actions: checkpoints,
probes, CC loops) vs the final .count() action — the attribution step
of the round-14 optimization pass (guide §1: measure first).

Usage: python scripts/profile_split.py name1,name2,... [--reps 2]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clinical_trials_data_pipeline_analyis_spark.session import get_spark
from clinical_trials_data_pipeline_analyis_spark.suite import spark_queries


def main() -> None:
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile-split")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()
    full = {n for n in qs}
    resolved = []
    for n in names:
        hits = [f for f in full if f == n or f.startswith(n + "_") or f.split("_")[0] == n]
        resolved.extend(hits)
    # dedupe (overlapping prefixes double-run queries) and fail with a
    # usage error on no match instead of an IndexError (ADVICE r14)
    resolved = list(dict.fromkeys(resolved))
    if not resolved:
        raise SystemExit(
            f"profile_split: no registered query matches {names!r}"
        )
    # warms (same as bench)
    qs[resolved[0]](spark, sf_dir).count()
    spark.range(0, 1024, 1, 32).mapInPandas(lambda it: it, "id long").count()
    for name in resolved:
        for r in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            n_rows = df.count()
            t2 = time.perf_counter()
            print(
                f"{name} rep{r}: construct={t1-t0:.3f}s count={t2-t1:.3f}s "
                f"total={t2-t0:.3f}s rows={n_rows}",
                flush=True,
            )


if __name__ == "__main__":
    main()
