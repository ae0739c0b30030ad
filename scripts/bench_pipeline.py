"""Medallion-pipeline throughput benchmark (not part of the driver's
BENCH contract — supplementary evidence of end-to-end pipeline speed).

Generates an AACT-shaped bronze fixture of --studies trials, runs the
full bronze->silver->gold pipeline including the quality gate and the
flagship opportunity query, and prints one JSON line with stage timings.

Usage: PYTHONPATH=.:tests python scripts/bench_pipeline.py --studies 20000
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--studies", type=int, default=20000)
    args = parser.parse_args()

    from fixtures import make_bronze_fixtures
    from clinical_trials_data_pipeline_analyis_spark.config import PipelineConfig
    from clinical_trials_data_pipeline_analyis_spark.pipeline import (
        build_gold,
        build_silver,
        run_quality_gate,
    )
    from clinical_trials_data_pipeline_analyis_spark.schemas import BRONZE_SCHEMAS
    from clinical_trials_data_pipeline_analyis_spark.session import get_spark
    from clinical_trials_data_pipeline_analyis_spark.sources.parquet import (
        write_table,
    )

    spark = get_spark(app_name="pipeline-bench")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    tables = make_bronze_fixtures(n_studies=args.studies, seed=42)
    gen_s = time.perf_counter() - t0

    with tempfile.TemporaryDirectory() as wh:
        config = PipelineConfig(warehouse_dir=wh)
        timings: dict[str, float] = {"fixture_gen": round(gen_s, 2)}

        t0 = time.perf_counter()
        bronze = {}
        for name, recs in tables.items():
            schema = BRONZE_SCHEMAS[name]
            df = spark.createDataFrame(
                [tuple(r.get(f.name) for f in schema.fields) for r in recs],
                schema,
            )
            write_table(df, config.layer_path("bronze", name))
            bronze[name] = spark.read.parquet(config.layer_path("bronze", name))
        timings["bronze_write"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        silver = build_silver(spark, bronze, config)
        timings["silver"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        run_quality_gate(bronze, silver, config)
        timings["quality_gate"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        gold = build_gold(spark, silver, config)
        timings["gold"] = round(time.perf_counter() - t0, 2)

        n_opportunity = gold["opportunity_rank"].count()
        total = round(sum(v for k, v in timings.items() if k != "fixture_gen"), 2)
        print(
            json.dumps(
                {
                    "metric": "medallion_pipeline_wall_clock",
                    "value": total,
                    "unit": "sec",
                    "stages": timings,
                    "studies": args.studies,
                    "opportunity_rows": n_opportunity,
                }
            )
        )


if __name__ == "__main__":
    main()
