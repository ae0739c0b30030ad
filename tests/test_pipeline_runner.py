"""End-to-end pipeline runner test: CSV extracts on disk -> bronze ->
silver (partitioned) -> quality gate -> gold parquet, via run_pipeline."""

from __future__ import annotations

import csv as csvmod
import io

import pytest

from fixtures import make_bronze_fixtures
from clinical_trials_data_pipeline_analyis_spark.config import PipelineConfig
from clinical_trials_data_pipeline_analyis_spark.pipeline import (
    EXTRACT_FILES,
    MAPPING_FILES,
    run_pipeline,
)
from clinical_trials_data_pipeline_analyis_spark.schemas import BRONZE_SCHEMAS


def _write_csv(path, records, schema, sep):
    cols = [f.name for f in schema.fields]
    with open(path, "w", newline="") as fh:
        w = csvmod.writer(fh, delimiter=sep, quoting=csvmod.QUOTE_MINIMAL)
        w.writerow(cols)
        for rec in records:
            w.writerow(["" if rec.get(c) is None else rec.get(c) for c in cols])


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("aact_csv")
    tables = make_bronze_fixtures(n_studies=200, seed=11)
    for table, filename in EXTRACT_FILES.items():
        _write_csv(d / filename, tables[table], BRONZE_SCHEMAS[table], "|")
    for table, filename in MAPPING_FILES.items():
        _write_csv(d / filename, tables[table], BRONZE_SCHEMAS[table], ",")
    return d


def test_run_pipeline_end_to_end(spark, data_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    config = PipelineConfig(warehouse_dir=str(wh))
    gold = run_pipeline(spark, str(data_dir), config)

    assert gold["fact_trials"].count() == 200
    assert gold["dim_dates"].count() == 18628  # 1980-01-01..2030-12-31
    # silver studies partitioned by study_type on disk
    parts = [
        p.name
        for p in (wh / "silver" / "studies").iterdir()
        if p.name.startswith("study_type=")
    ]
    assert len(parts) >= 2
    # gold written and re-readable
    opp = spark.read.parquet(str(wh / "gold" / "opportunity_rank"))
    cols = set(opp.columns)
    assert cols == {
        "condition_name",
        "therapeutic_area",
        "total_trials",
        "opportunity_score",
    }
