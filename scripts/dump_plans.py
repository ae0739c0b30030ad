"""Dump .explain("formatted") for every registered query to plans/<tag>/.

Usage: python scripts/dump_plans.py <tag> [only1,only2,...]

Writes plans/<tag>/<short>_<suffix>.txt per query, where <suffix> is
given by $SPARK_GRAFT_PLAN_SUFFIX (default "before"). Queries whose
construction raises are recorded with the traceback so a plan diff
never silently drops a query.

Plan capture is CONSTRUCTION ONLY (no action is run) except that some
operators run bounded construction-time actions themselves (documented
on the operators); those run exactly as the bench does.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clinical_trials_data_pipeline_analyis_spark.session import get_spark
from clinical_trials_data_pipeline_analyis_spark.suite import spark_queries


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()
    for name, fn in sorted(qs.items()):
        short = name.split("_", 1)[0]
        if only and short not in only and name not in only:
            continue
        path = os.path.join(out_dir, f"{short}_{suffix}.txt")
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            plan = "CONSTRUCTION FAILED\n" + traceback.format_exc()
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir}\n")
            f.write(plan)
        print(f"{name} -> {path}")


if __name__ == "__main__":
    main()
