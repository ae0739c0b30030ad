"""AS-OF join: match each left row to the most recent right row at or
before (optionally strictly before) its timestamp, per key.

Spark has no native as-of join; the scalable composition here is the
union-tag + running ``last(..., ignorenulls)`` window:

1. union the tagged left and right rows into one frame;
2. sort within each key partition by (ts, tag) — the tag ordering encodes
   strict vs inclusive matching at equal timestamps;
3. the running last-non-null of the right-side value columns IS the as-of
   match for every left row.

Cost: ONE shuffle on the key (the window partition), no range join, no
per-row search — this is the join strategy that survives 100 TB, unlike
an inequality theta-join. (Pandas users know this as merge_asof; DuckDB
has native ASOF JOIN, which the suite oracle uses.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """Left as-of join.

    ``left`` keeps all its columns; each row gains ``asof_<ts_col>`` and
    the requested right ``value_cols``, taken from the latest right row
    with the same ``on`` keys and ``right.ts <= left.ts`` (``<`` when
    ``strict``). Right rows should be unique per (on, ts) — pre-aggregate
    if not, otherwise the latest-sorted duplicate wins.
    """
    # Tag ordering at equal ts: visible rows sort BEFORE the left row.
    # inclusive: right(0) < left(1)  — right at equal ts is matched.
    # strict:    left(0) < right(1) — right at equal ts is not.
    tag_left, tag_right = (0, 1) if strict else (1, 0)

    left_cols = [c for c in left.columns]
    l = left.select(
        *left_cols,
        F.lit(tag_left).alias("_tag"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"_r_{v}") for v in value_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("_r_ts"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in on + [ts_col]],
        *[F.col(k) for k in on],
        F.col(ts_col),
        F.lit(tag_right).alias("_tag"),
        *[F.col(v).alias(f"_r_{v}") for v in value_cols],
        F.col(ts_col).alias("_r_ts"),
    ).select(*l.columns)  # align column order

    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.select(
        *left_cols,
        F.col("_tag"),
        F.last("_r_ts", ignorenulls=True).over(w).alias(f"asof_{ts_col}"),
        *[
            F.last(f"_r_{v}", ignorenulls=True).over(w).alias(v)
            for v in value_cols
        ],
    )
    return matched.filter(F.col("_tag") == tag_left).drop("_tag")
