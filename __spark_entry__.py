"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: smoke check — runs the flagship weighted
  opportunity-score query (the analog of the reference's
  ``gold.opportunity_rank``, ``aact_gold_layer.sql:260-349``) on sf0.001.
- ``queries()``: one entry per implemented operator from SURVEY.md §2 plus
  the LLM-pipeline extensions; see
  ``clinical_trials_data_pipeline_analyis_spark/suite/``.
- ``oracle_sql()``: value-exact DuckDB equivalents for every
  SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clinical_trials_data_pipeline_analyis_spark.suite import (
    oracle_queries,
    spark_queries,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return spark_queries()["q06_opportunity_rank"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL, value-exact vs the Spark results."""
    return oracle_queries()
