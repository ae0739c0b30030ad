"""End-to-end medallion pipeline parity vs the DuckDB reference
translation, plus the data-quality invariant suite, on AACT-shaped
fixtures (FIXTURES.md)."""

from __future__ import annotations

import duckdb
import pytest

from compare_util import compare_frames
from fixtures import make_bronze_fixtures

import aact_oracle as oracle
from clinical_trials_data_pipeline_analyis_spark.config import DEFAULT_CONFIG
from clinical_trials_data_pipeline_analyis_spark.schemas import BRONZE_SCHEMAS
from clinical_trials_data_pipeline_analyis_spark.plans import (
    bridge_trial_conditions,
    bridge_trial_interventions,
    bridge_trial_sponsors,
    dim_conditions,
    dim_dates,
    dim_interventions,
    dim_sponsors,
    dim_studies,
    fact_trials,
    opportunity_rank,
    silver_conditions,
    silver_interventions,
    silver_outcomes,
    silver_sponsors,
    silver_studies,
)
from clinical_trials_data_pipeline_analyis_spark.plans import quality


@pytest.fixture(scope="module")
def bronze(spark, tmp_path_factory):
    """Spark bronze DataFrames + parquet copies for the DuckDB oracle."""
    tmp = tmp_path_factory.mktemp("aact_bronze")
    tables = make_bronze_fixtures(n_studies=800, seed=42)
    dfs = {}
    for name, records in tables.items():
        schema = BRONZE_SCHEMAS[name]
        rows = [tuple(rec.get(f.name) for f in schema.fields) for rec in records]
        df = spark.createDataFrame(rows, schema)
        path = str(tmp / name)
        df.write.mode("overwrite").parquet(path)
        dfs[name] = spark.read.parquet(path)
    return dfs, tmp


@pytest.fixture(scope="module")
def spark_tables(spark, bronze):
    dfs, _ = bronze
    sstud = silver_studies(dfs["studies"], DEFAULT_CONFIG)
    sspon = silver_sponsors(dfs["sponsors"], dfs["sponsor_mapping"])
    scond = silver_conditions(dfs["conditions"])
    sint = silver_interventions(dfs["interventions"], dfs["intervention_mapping"])
    sout = silver_outcomes(dfs["outcomes"])
    d_stud = dim_studies(sstud)
    d_spon = dim_sponsors(sspon)
    d_cond = dim_conditions(scond)
    d_int = dim_interventions(sint)
    d_date = dim_dates(spark)
    return {
        "silver_studies": sstud,
        "silver_sponsors": sspon,
        "silver_conditions": scond,
        "silver_interventions": sint,
        "silver_outcomes": sout,
        "dim_studies": d_stud,
        "dim_sponsors": d_spon,
        "dim_conditions": d_cond,
        "dim_interventions": d_int,
        "dim_dates": d_date,
        "fact_trials": fact_trials(sstud, d_stud, d_date),
        "bridge_trial_sponsors": bridge_trial_sponsors(sspon, d_spon),
        "bridge_trial_conditions": bridge_trial_conditions(scond, d_cond),
        "bridge_trial_interventions": bridge_trial_interventions(sint, d_int),
        "opportunity_rank": opportunity_rank(sstud, scond, sint, sspon),
    }


@pytest.fixture(scope="module")
def duck(bronze):
    _, tmp = bronze
    con = duckdb.connect()
    for name in BRONZE_SCHEMAS:
        con.execute(
            f"CREATE VIEW bronze_{name} AS SELECT * FROM '{tmp}/{name}/*.parquet'"
        )
    for sql in (
        oracle.SILVER_STUDIES_SQL,
        oracle.SILVER_SPONSORS_SQL,
        oracle.SILVER_CONDITIONS_SQL,
        oracle.SILVER_INTERVENTIONS_SQL,
        oracle.SILVER_OUTCOMES_SQL,
    ):
        con.execute(sql)
    for stmt in oracle.GOLD_SQL.split(";"):
        if stmt.strip():
            con.execute(stmt)
    return con


_TABLES = [
    "silver_studies",
    "silver_sponsors",
    "silver_conditions",
    "silver_interventions",
    "silver_outcomes",
    "dim_studies",
    "dim_sponsors",
    "dim_conditions",
    "dim_interventions",
    "dim_dates",
    "fact_trials",
    "bridge_trial_sponsors",
    "bridge_trial_conditions",
    "bridge_trial_interventions",
    "opportunity_rank",
]


@pytest.mark.parametrize("table", _TABLES)
def test_pipeline_table_matches_reference_translation(spark_tables, duck, table):
    got = spark_tables[table].toPandas()
    want = duck.execute(f"SELECT * FROM {table}").df()
    compare_frames(table, got, want)


def test_quality_suite_green(bronze, spark_tables):
    dfs, _ = bronze
    results = quality.silver_studies_suite(
        dfs["studies"], spark_tables["silver_studies"]
    )
    failures = [r for r in results if not r.passed]
    assert not failures, f"quality violations: {failures}"


def test_dim_key_density(spark_tables):
    """Surrogate keys are dense 1..N (reference row_number contract)."""
    from pyspark.sql import functions as F

    for name, key in [
        ("dim_studies", "study_key"),
        ("dim_sponsors", "sponsor_key"),
        ("dim_conditions", "condition_key"),
        ("dim_interventions", "intervention_key"),
    ]:
        df = spark_tables[name]
        stats = df.agg(
            F.min(key).alias("lo"), F.max(key).alias("hi"), F.count("*").alias("n")
        ).collect()[0]
        assert stats["lo"] == 1 and stats["hi"] == stats["n"], name


def test_n2_phase_null_lands_in_phase4(spark, bronze):
    """SURVEY N2: NULL phase must recode to 'PHASE 4', not 'Not Applicable'."""
    dfs, _ = bronze
    from pyspark.sql import functions as F

    silver = silver_studies(dfs["studies"])
    joined = (
        dfs["studies"].select("nct_id", F.col("phase").alias("raw_phase"))
        .join(silver.select("nct_id", "phase"), "nct_id")
    )
    nulls = joined.filter(F.col("raw_phase").isNull())
    assert nulls.count() > 0, "fixture must exercise NULL phases"
    assert nulls.filter(F.col("phase") != "PHASE 4").count() == 0
