"""Bucketed-table IO: the shuffle-free co-located join path.

Spark's bucketing hash-partitions rows into a fixed number of buckets
per bucket column at WRITE time and records the layout in the catalog.
A join of two tables bucketed by the same columns into the same bucket
count plans a SortMergeJoin with NO Exchange on either side — at 100 TB
this converts every recurring fact-to-fact join (e.g. the star schema's
fact joined to its bridge tables on the natural key, reference
`aact_gold_layer.sql:193-201,215-252`) from a full network shuffle into
a per-bucket local merge. With ``sortBy`` on the join key the per-bucket
sort is pre-paid at write time too.

Bucketing metadata lives only in the metastore, so bucketed tables must
go through ``saveAsTable`` — a plain ``.parquet(path)`` write silently
drops the bucket spec. Pick ``num_buckets`` so one bucket of the LARGER
table fits an executor's memory (buckets are the parallelism floor:
too few buckets caps the scan's task count).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally bucket-sorted) catalog table.

    ``path`` makes it an external table (data at ``path``, layout in the
    catalog); omitted, it lands in the session warehouse.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (the bucket layout
    only survives a ``spark.table`` read — ``spark.read.parquet`` on the
    files would forget it and reintroduce the shuffle)."""
    return spark.table(table)
