"""Incremental SCD2 maintenance over a change-log stream.

The batch form (``operators/scd.py``) collapses a complete observation
log in one pass. A CDC stream delivers observations incrementally —
possibly out of event-time order ACROSS micro-batches — and a collapsed
dimension cannot be merged with late observations correctly (a late
'b@t' between two collapsed 'a' versions must SPLIT them, but the
collapse already dropped the second 'a' observation that proves the
split). The sound streaming state is therefore the OBSERVATION LOG
itself, not the collapsed rows, the same store-the-inputs shape as the
incremental near-dedup stream (``streaming/dedup.py``).

Per micro-batch:

1. append the batch's observations to a key-hash-bucketed store —
   partitioned by (epoch, bucket) with dynamic overwrite, so an
   at-least-once retry rewrites its own epoch partitions instead of
   duplicating observations;
2. recompute SCD2 rows for the TOUCHED buckets only (the store read is
   partition-pruned to those buckets) with the exact batch operator;
3. dynamically overwrite just those buckets of the dimension table.

At 100 TB: per-epoch cost is proportional to the touched buckets'
history, not the corpus; raise ``buckets`` until a bucket's history
fits an executor. The dimension table stays hash-bucket partitioned —
exactly the layout an as-of fact join wants to co-locate on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import hash_bucket
from ..operators.scd import scd2_from_log


def scd2_stream(
    obs_stream: DataFrame,
    store_path: str,
    dim_path: str,
    checkpoint: str,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
    buckets: int = 64,
):
    """Returns an unstarted ``DataStreamWriter``; ``.start()`` it.

    After the stream drains, ``dim_path`` holds the same SCD2 rows (plus
    a ``_kb`` bucket column) as ``scd2_from_log`` over the union of all
    micro-batches — equality-tested regardless of how observations were
    split across batches or their cross-batch event-time order.
    """

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        b = batch_df.select(
            key_col, attr_col, ts_col, tiebreak_col
        ).withColumn("_kb", hash_bucket(F.col(key_col), buckets))
        touched = [r["_kb"] for r in b.select("_kb").distinct().collect()]
        if not touched:
            return
        (
            b.withColumn("epoch_id", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id", "_kb")
            .parquet(store_path)
        )
        hist = spark.read.parquet(store_path).filter(
            F.col("_kb").isin(touched)
        )
        dim = scd2_from_log(
            hist, key_col, attr_col, ts_col, tiebreak_col
        ).withColumn("_kb", hash_bucket(F.col(key_col), buckets))
        (
            dim.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_kb")
            .parquet(dim_path)
        )

    return (
        obs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
