"""Mergeable distribution sketches: binned quantile estimation.

Exact percentiles (``percentile``/``percentile_cont``, SURVEY §2 A8 /
q13) need every value of a group co-located and sorted — at 100 TB
that is a full shuffle of the measure column and a sort per group. The
scalable alternative every metrics store uses is a *mergeable
histogram*: bucket values into fixed-width bins map-side, combine bin
counts (a partial aggregate — the shuffle carries |groups| x |bins|
rows, independent of row count), then read quantile estimates off the
cumulative bin counts. Error is bounded by the bin width; the sketch
merges associatively across partitions, days, or clusters.

Everything below is deterministic integer/float arithmetic that DuckDB
reproduces bit-for-bit, so the estimator itself is oracle-checkable —
the cumulative-count threshold test is integer math (``cum * 10_000 >=
q_bp * total``), never a float comparison on a boundary.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def binned_histogram(
    df: DataFrame, group_col: str, value_col: str, bin_width: float
) -> DataFrame:
    """(group, bin, cnt): fixed-width histogram per group. NULL measures
    are excluded (they carry no distribution information). ``bin`` is
    ``floor(value / bin_width)`` — negative values bin correctly."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col),
            F.floor(F.col(value_col) / F.lit(bin_width))
            .cast("long")
            .alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def binned_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bin_width: float,
    quantiles_bp: Sequence[int] = (5000, 9000, 9900),
) -> DataFrame:
    """(group, q_bp, est): upper-edge quantile estimates per group from
    the binned histogram. ``q_bp`` is the quantile in basis points
    (5000 = p50); ``est`` is the upper edge of the first bin whose
    cumulative count reaches the quantile — an estimate with error at
    most ``bin_width``, never below the true quantile.

    Scale shape: the only full-data pass is the map-side-combined
    histogram aggregate; the cumulative window runs over |groups| x
    |bins| rows partitioned by group, and the quantile fan-out
    (explode of the requested quantile list) multiplies only that tiny
    table. Compare q13 (exact percentile): same answer class, but this
    plan's shuffle is O(bins) per group instead of O(rows).
    """
    hist = binned_histogram(df, group_col, value_col, bin_width)
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(group_col)
    cum = hist.withColumns(
        {
            "cum": F.sum("cnt").over(w_cum),
            "total": F.sum("cnt").over(w_tot),
        }
    )
    qs = F.explode(
        F.array(*[F.lit(int(q)).cast("long") for q in quantiles_bp])
    ).alias("q_bp")
    return (
        cum.select(group_col, "bin", "cum", "total", qs)
        .filter(F.col("cum") * 10_000 >= F.col("q_bp") * F.col("total"))
        .groupBy(group_col, "q_bp")
        .agg(
            F.round((F.min("bin") + 1) * F.lit(bin_width), 6).alias("est")
        )
    )


def linear_counting_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    m: int = 1024,
) -> DataFrame:
    """(group, d_buckets, est_distinct, exact_distinct, rel_err):
    mergeable approximate COUNT(DISTINCT) by linear counting (Whang et
    al. 1990): hash each value into ``m`` buckets, count occupied
    buckets d, estimate n ~ -m * ln(1 - d/m). The estimate is computed
    alongside the exact count here so callers (and tests) see the
    error; production use drops the exact column and with it the full
    distinct shuffle.

    Scale shape: the sketch's shuffle carries at most ``m`` occupied
    buckets per group — constant in corpus size — and occupied-bucket
    SETS merge by union across partitions/days/clusters, which is what
    makes the estimator incremental where exact COUNT(DISTINCT) must
    re-shuffle every distinct value. The hash is the engine-portable
    md5 idiom (``operators/sampling.hash_bucket``), so the estimate is
    deterministic and exactly reproducible in DuckDB: saturated groups
    (d == m) yield NULL (ln(0)), the signal to raise m.
    """
    from ..operators.sampling import hash_bucket

    md = F.col("_d").cast("double")
    est = F.when(
        F.col("_d") < m, F.round(-m * F.log(F.lit(1.0) - md / m), 6)
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.count_distinct(
                hash_bucket(F.col(value_col), m)
            ).cast("long").alias("_d"),
            F.count_distinct(F.col(value_col)).cast("long").alias(
                "exact_distinct"
            ),
        )
        .select(
            group_col,
            F.col("_d").alias("d_buckets"),
            est.alias("est_distinct"),
            "exact_distinct",
            F.round(
                F.abs(est - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                6,
            ).alias("rel_err"),
        )
    )


# =====================================================================
# HyperLogLog-shaped register-max distinct sketch
# =====================================================================

#: Default register count (2^10). Standard error ~ 1.04/sqrt(m) = 3.25%.
HLL_M = 1024


def _hll_rho(value_col) -> "F.Column":
    """rho = (leading zero bits of a 32-bit hash word) + 1, in [1, 33].

    The hash word is md5 hex chars 9-16 of the value — disjoint from
    the register-index chars 1-8 (`sampling.hash_bucket`), the standard
    HLL split of one hash into (index bits, rank bits). Leading zeros
    are counted with STRING ops + a 16-way CASE over the first non-zero
    hex digit — pure integer/string arithmetic, no float log2 (whose
    floor is engine-fragile at exact powers of two), so rho is
    bit-identical across engines. An all-zero word (p = 2^-32) gets
    rho = 33.
    """
    hx = F.substring(F.md5(value_col.cast("string")), 9, 8)
    stripped = F.regexp_replace(hx, "^0+", "")
    nz_hex = F.lit(8) - F.length(stripped)
    first = F.substring(stripped, 1, 1)
    in_digit = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return F.when(F.length(stripped) == 0, F.lit(33)).otherwise(
        nz_hex * 4 + in_digit + 1
    )


def hll_registers(
    df: DataFrame, group_col: str, value_col: str, m: int = HLL_M
) -> DataFrame:
    """(group, register, max_rho): the HLL register table — the sketch
    itself. Registers MERGE BY MAX across partitions, micro-batches,
    days, or clusters (max is associative/commutative/idempotent),
    which is the whole point: union two corpora's register tables,
    take max per register, read the estimate — no re-scan.

    Scale shape: one map-side-combinable aggregate; the shuffle carries
    at most ``m`` registers per group, constant in corpus size.
    """
    from .sampling import hash_bucket

    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col),
            hash_bucket(F.col(value_col), m).cast("long").alias("register"),
        )
        .agg(F.max(_hll_rho(F.col(value_col))).cast("long").alias("max_rho"))
    )


def hll_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    m: int = HLL_M,
    with_exact: bool = True,
) -> DataFrame:
    """(group, occupied_registers, est_distinct, exact_distinct,
    rel_err): HyperLogLog distinct estimate (Flajolet et al. 2007) per
    group, next to the exact count so callers (and tests) see the
    error; production use passes ``with_exact=False`` and drops the
    full distinct shuffle.

    Unlike linear counting (`linear_counting_distinct`), the estimator
    does NOT saturate when cardinality approaches or exceeds the
    register count: a full register table still carries max-rho ranks
    that keep growing with cardinality. The small-range regime
    (raw estimate <= 2.5m with empty registers) falls back to linear
    counting over EMPTY registers exactly as the paper prescribes.

    Determinism: sum(2^-max_rho) adds exact dyadic rationals (each
    has <= 33 fractional bits, the total needs < 53 bits), so the sum
    is EXACT regardless of add order and the estimate reproduces
    bit-for-bit in DuckDB — the sketch estimate itself is
    value-oracled, not just bounded.
    """
    regs = hll_registers(df, group_col, value_col, m=m)
    out = hll_estimate_from_registers(regs, group_col, m=m)
    if not with_exact:
        return out
    exact = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.count_distinct(F.col(value_col)).cast("long").alias(
                "exact_distinct"
            )
        )
    )
    return out.join(exact, group_col).select(
        group_col,
        "occupied_registers",
        "est_distinct",
        "exact_distinct",
        F.round(
            F.abs(F.col("est_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            6,
        ).alias("rel_err"),
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_col: str, m: int = HLL_M
) -> DataFrame:
    """(group, occupied_registers, est_distinct) from a REGISTER TABLE —
    the read-off for stored/streamed/merged sketches (``hll_distinct``
    computes its registers inline; a streaming sink or a union of
    per-day sketches holds only (group, register, max_rho) rows, and
    this turns them into the estimate with the identical arithmetic:
    exact dyadic 2^-rho sums, small-range linear-counting fallback).

    The read-off TRUSTS nothing about the caller's ``m``: a register
    table built with a LARGER m (or a union of mixed-m sketches) has
    more than ``m`` occupied registers per group, which would silently
    produce a negative zero-count and a nonsensical estimate. That
    mismatch is made LOUD instead — ``est_distinct`` comes back NULL
    whenever ``occupied_registers > m``, so a sketch/parameter drift
    between writer and reader fails visibly downstream rather than
    skewing counts."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = regs.groupBy(group_col).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("_occ_sum"),
        F.count(F.lit(1)).cast("long").alias("occupied_registers"),
    )
    zeros = (F.lit(m) - F.col("occupied_registers")).cast("double")
    raw = F.lit(alpha * m * m) / (F.col("_occ_sum") + zeros)
    est = (
        F.when(
            F.col("occupied_registers") > m, F.lit(None).cast("double")
        )
        .when(
            (raw <= 2.5 * m) & (F.col("occupied_registers") < m),
            F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / zeros), 6),
        )
        .otherwise(F.round(raw, 6))
    )
    return agg.select(
        group_col, "occupied_registers", est.alias("est_distinct")
    )


def hll_rho_sql(value_sql: str) -> str:
    """The DuckDB expression mirroring ``_hll_rho`` — exposed so oracle
    SQL interpolates the SAME definition the Spark side computes."""
    stripped = f"regexp_replace(substr(md5({value_sql}), 9, 8), '^0+', '')"
    return f"""CASE WHEN length({stripped}) = 0 THEN 33
     ELSE (8 - length({stripped})) * 4
          + CASE substr({stripped}, 1, 1)
                WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                WHEN '7' THEN 1 ELSE 0 END
          + 1 END"""


# =====================================================================
# Count-min sketch: mergeable heavy-hitter frequency estimation
# =====================================================================

#: Default CMS geometry: d independent hash rows x w counters. Error is
#: ~ N * e/w with probability 1 - e^-d; d*w cells is the WHOLE sketch
#: (4 x 256 = 1024 counters), mergeable by cell-wise addition.
CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_cells(
    df: DataFrame, value_col: str, d: int = CMS_DEPTH, w: int = CMS_WIDTH
) -> DataFrame:
    """(row, col, cell_count): the count-min sketch of a value column
    (Cormode & Muthukrishnan 2005). Each value increments one counter
    per hash row; the estimate for a key is the MIN over its d cells
    (collisions only ever inflate, so CMS over-estimates).

    Scale shape: the fan-out is row-local (a d-element literal array
    explode), and the aggregate partial-combines map-side down to at
    most d x w cells per partition — the shuffle carries O(d*w) rows
    per partition regardless of corpus size, and sketches of two
    corpora (or two days, or two clusters) MERGE by summing cells.
    The hash is the engine-portable md5 idiom salted per row
    (``md5(row || ':' || value)``), deterministic across engines.
    """
    from .sampling import hash_bucket

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
        df.filter(F.col(value_col).isNotNull())
        .select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count(F.lit(1)).cast("long").alias("cell_count"))
    )


def cms_topk_estimates(
    df: DataFrame,
    value_col: str,
    k: int = 20,
    d: int = CMS_DEPTH,
    w: int = CMS_WIDTH,
) -> DataFrame:
    """(value, exact_count, cms_estimate, overestimate, rank): the k most
    frequent values with their exact counts next to the CMS estimate, so
    callers (and tests) see the collision inflation. Production
    heavy-hitter queries drop the exact branch and with it the full
    per-value shuffle: the sketch answers point queries from d*w cells.

    The candidate set here is the exact top-k (count DESC, value ASC —
    total order); each candidate recomputes its d cell coordinates
    row-locally and probes the BROADCAST sketch (d*w rows, KBs), taking
    the min cell count over rows.
    """
    from .sampling import hash_bucket

    cells = cms_cells(df, value_col, d=d, w=w)
    exact = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).cast("string").alias("value"))
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), F.col("value"))
        .limit(k)
    )
    probes = exact.select(
        "value",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("long").alias("row"),
                        hash_bucket(
                            F.concat(F.lit(f"{r}:"), F.col("value")), w
                        )
                        .cast("long")
                        .alias("col"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("c"),
    ).select("value", "exact_count", F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    est = (
        probes.join(F.broadcast(cells), ["row", "col"])
        .groupBy("value", "exact_count")
        .agg(F.min("cell_count").alias("cms_estimate"))
    )
    return est.select(
        "value",
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
        F.row_number()
        .over(
            Window.orderBy(F.col("exact_count").desc(), F.col("value"))
        )
        .cast("long")
        .alias("rank"),
    )
