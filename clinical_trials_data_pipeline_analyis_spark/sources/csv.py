"""CSV ingestion (bronze layer sources).

Reproduces the reference's ``COPY ... WITH (FORMAT csv, DELIMITER '|',
HEADER true)`` ingest (``aact_bronze_layer.sql:93-99`` and siblings) and the
comma-delimited mapping-spreadsheet loads (``aact_bronze_layer.sql:144-150,
224-230``) as schema-on-write Spark reads: explicit StructType, never
``inferSchema``, PERMISSIVE mode with a corrupt-record audit column so bad
rows are countable instead of silently dropped.

At scale this is a splittable parallel scan: Spark assigns one task per
~128MB file split; no shuffle occurs until a downstream wide operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_pipe_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    sep: str = "|",
    header: bool = True,
) -> DataFrame:
    """Read a pipe-delimited AACT extract under an explicit schema."""
    return (
        spark.read.schema(schema)
        .options(
            sep=sep,
            header=str(header).lower(),
            mode="PERMISSIVE",
            # AACT free-text columns contain quoted newlines and quotes.
            quote='"',
            escape='"',
            multiLine="true",
            dateFormat="yyyy-MM-dd",
            timestampFormat="yyyy-MM-dd HH:mm:ss[.SSSSSS]",
        )
        .csv(path)
    )


def read_mapping_csv(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Read a curated comma-delimited mapping spreadsheet (small lookup).

    Downstream joins should wrap the result in ``F.broadcast`` — mapping
    tables are a few thousand rows and must never shuffle the big side.
    """
    return read_pipe_csv(spark, path, schema, sep=",")
