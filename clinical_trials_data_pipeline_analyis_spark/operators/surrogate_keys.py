"""Surrogate-key generation for dimension builds.

The reference uses ``ROW_NUMBER() OVER (ORDER BY k)`` with no partition
(``aact_gold_layer.sql:27,66,138,161``) — exact, dense, deterministic, but
a single-partition sort in Spark. Two implementations behind one
interface:

- ``surrogate_key_exact``: the faithful global row_number. Correct choice
  for dimension tables, which are DISTINCT-reduced first and small by
  construction (every AACT dim is <10M rows even at 100 TB fact scale).
- ``surrogate_key_scalable``: for huge inputs — per-partition dense ranks
  offset by the cumulative count of the preceding partitions
  (zipWithIndex-style, expressed with DataFrame ops). Keys are dense and
  deterministic for the same partitioning but not ordered globally by the
  key column; use when the dim itself is beyond single-node sort size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def surrogate_key_exact(
    df: DataFrame, key_name: str, order_by: list[str]
) -> DataFrame:
    w = Window.orderBy(*order_by)
    return df.select(
        F.row_number().over(w).cast("long").alias(key_name), "*"
    )


def surrogate_key_scalable(
    df: DataFrame, key_name: str, order_by: list[str]
) -> DataFrame:
    """Dense deterministic keys without a global sort.

    Plan: sort-within-repartition on the order key (range partitioner) →
    per-partition row_number → add the exclusive prefix-sum of partition
    sizes (a tiny driver-side map, one value per partition). Output keys
    equal the exact variant's (global order by range partitioning +
    in-partition order) while the heavy sort runs fully parallel.
    """
    parted = df.repartitionByRange(*order_by).sortWithinPartitions(*order_by)
    with_pid = parted.select(
        F.spark_partition_id().alias("_pid"), "*"
    )
    sizes = (
        with_pid.groupBy("_pid")
        .count()
        .orderBy("_pid")
        .collect()
    )
    offsets = {}
    acc = 0
    for row in sizes:
        offsets[row["_pid"]] = acc
        acc += row["count"]
    if offsets:
        offset_col = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )[F.col("_pid")]
    else:
        # empty input: create_map() with zero args is a VOID-typed map
        # that fails analysis — there are no rows, any offset works
        offset_col = F.lit(0).cast("long")
    w = Window.partitionBy("_pid").orderBy(*order_by)
    return (
        with_pid.select(
            (F.row_number().over(w).cast("long") + offset_col).alias(key_name),
            "*",
        )
        .drop("_pid")
    )
