"""JSONL (newline-delimited JSON) source/sink.

The interchange format LLM corpora actually ship as (one JSON object
per line, usually gzip'd); the engine's parquet tables are the compute
format, JSONL is the import/export boundary. Reference ingest analog:
the pipe-delimited COPY loaders of `aact_bronze_layer.sql` (same role —
bulk text interchange into the bronze layer; different wire format).

Scale rules encoded here:

- **Schema is REQUIRED on read.** Spark's JSON schema inference scans
  the whole dataset once before the real read — at 100 TB that doubles
  the job. Callers pass the schema (or sample one off a single file
  first).
- Gzip JSONL files are NOT splittable — one task per file regardless of
  size. Fine for many ~100 MB-1 GB shards (the standard corpus layout);
  a single huge .gz would serialize the scan, so ``write_jsonl``
  defaults to per-partition shards (one file per task) rather than
  coalescing.
- Binary/multimodal payloads do NOT belong in JSONL (base64 bloats them
  ~33% and breaks column pruning); keep them in parquet
  (`operators/multimodal.py`) and export text-only projections here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    partition_by: tuple[str, ...] = (),
) -> None:
    """One JSON object per line, sharded one file per task (splittable
    scan layout). ``partition_by`` produces hive-style directories so a
    downstream read prunes on those keys."""
    writer = df.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Schema-first JSONL read. ``mode`` follows Spark's JSON parser:
    FAILFAST surfaces corrupt lines immediately (the right default for a
    pipeline you trust to be clean); pass ``PERMISSIVE`` plus a
    ``_corrupt_record`` field in the schema to quarantine bad lines
    instead of failing the job."""
    return spark.read.schema(schema).option("mode", mode).json(path)


def read_jsonl_quarantined(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE JSONL read split into (good_rows, quarantine).

    Real corpus drops always contain some malformed lines (truncated
    shards, encoding damage, producer bugs); failing a 100 TB job on
    line 40-billion-and-one is not an option, and silently dropping bad
    lines destroys the audit trail. This reads with Spark's PERMISSIVE
    parser, routing unparseable lines into ``corrupt_col`` with the RAW
    line preserved:

    - ``good``: rows that parsed, with ``corrupt_col`` removed;
    - ``quarantine``: one row per bad line — the RAW line in
      ``corrupt_col`` plus whatever fields did parse (all NULL for
      fully-malformed lines) — write it next to the ingest for
      repair/forensics. (The full row is kept deliberately: Spark
      refuses a query that references ONLY the corrupt-record column
      of a raw scan — QUERY_ONLY_CORRUPT_RECORD_COLUMN.)

    The split is two filters over ONE scan lineage (no extra pass; a
    cached read serves both if the caller materializes). Note Spark's
    PERMISSIVE semantics: a line that parses but violates the schema
    types also lands in quarantine with its raw text.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField

    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    # Build a FRESH StructType: StructType.add mutates in place and
    # returns self, so using it here would silently grow the caller's
    # schema object (and a second call would append the corrupt column
    # twice, yielding a duplicate-column schema).
    fields = [f for f in schema.fields if f.name != corrupt_col]
    full = StructType(fields + [StructField(corrupt_col, StringType(), True)])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantine = df.filter(F.col(corrupt_col).isNotNull())
    return good, quarantine
