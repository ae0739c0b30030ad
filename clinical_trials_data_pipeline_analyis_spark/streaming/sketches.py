"""Streaming distribution sketches: the histogram from
``operators/sketches.py`` maintained incrementally over a stream.

A fixed-width binned histogram is a *mergeable* aggregate — per-batch
bin counts add associatively — so the streaming form is a plain
streaming groupBy on (group, bin): Spark's state store holds one count
per live (group, bin) key, each micro-batch folds in map-side partial
counts, and quantile read-off (``binned_quantiles``'s cumulative scan)
runs over the sink table whenever someone asks. No custom stateful
operator needed; state size is |groups| x |bins| regardless of how many
rows streamed through — the property that makes the sketch the 100 TB
answer to "p99 over an unbounded stream".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def value_histogram_stream(
    events: DataFrame, group_col: str, value_col: str, bin_width: float
) -> DataFrame:
    """(group, bin, cnt) as a streaming aggregation. Identical bin
    semantics to the batch ``binned_histogram`` (floor division, NULL
    measures dropped) so stream-accumulated counts equal a batch run
    over the union of all micro-batches.

    Run in update/complete mode; the aggregate is a running total, not
    windowed, so it never emits a key twice with the same value. For a
    time-decaying sketch, compose with a tumbling ``F.window`` group key
    and a watermark instead — bin math is unchanged.
    """
    return (
        events.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col),
            F.floor(F.col(value_col) / F.lit(bin_width))
            .cast("long")
            .alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hll_registers_stream(
    events: DataFrame, group_col: str, value_col: str, m: int = 1024
) -> DataFrame:
    """(group, register, max_rho): the HyperLogLog register table from
    ``operators/sketches.hll_registers`` maintained incrementally over
    a stream. MAX is associative, commutative, and IDEMPOTENT, so the
    stream-accumulated registers equal a batch run over the union of
    all micro-batches — and replayed records cannot even inflate the
    sketch (idempotence is a stronger merge property than the
    histogram/CMS addition twins above).

    State is at most |groups| x m registers no matter how many rows
    stream through. Run in update/complete mode; the estimate reads off
    the sink with the batch ``hll_distinct`` arithmetic whenever asked.
    """
    from ..operators.sampling import hash_bucket
    from ..operators.sketches import _hll_rho

    return (
        events.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col),
            hash_bucket(F.col(value_col), m).cast("long").alias("register"),
        )
        .agg(F.max(_hll_rho(F.col(value_col))).cast("long").alias("max_rho"))
    )


def cms_cells_stream(
    events: DataFrame, value_col: str, d: int = 4, w: int = 256
) -> DataFrame:
    """(row, col, cell_count): the count-min sketch from
    ``operators/sketches.cms_cells`` maintained incrementally over a
    stream. Identical cell semantics (salted-md5 buckets, NULLs
    dropped), so the stream-accumulated cells equal a batch run over
    the union of all micro-batches — the merge-by-addition property IS
    the streaming story.

    State is exactly d x w counters no matter how many events stream
    through (the bounded-state contract of ``streaming/``: nothing here
    scales with history). Run in update/complete mode; point estimates
    read MIN over a key's d cells off the sink whenever asked, exactly
    as in the batch ``cms_topk_estimates``.
    """
    from ..operators.sampling import hash_bucket

    v = F.col(value_col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(r).cast("long").alias("row"),
                hash_bucket(F.concat(F.lit(f"{r}:"), v), w)
                .cast("long")
                .alias("col"),
            )
            for r in range(d)
        ]
    )
    return (
        events.filter(F.col(value_col).isNotNull())
        .select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count(F.lit(1)).cast("long").alias("cell_count"))
    )
