"""Deterministic sampling for training-data curation.

``df.sample()`` is seed-and-partitioning dependent — rerunning on a
repartitioned corpus samples DIFFERENT rows, which breaks reproducible
dataset releases. These operators hash the row KEY instead: a row's
in/out decision depends only on its id, so samples are stable across
cluster layouts, engines, and reruns (md5 is identical everywhere), and
disjoint rate ranges compose (the 5% sample is a subset of the 10%).

- ``hash_bucket``: portable 0..buckets-1 bucket from the md5 of the key.
- ``hash_sample``: keep rows with bucket < pct — a deterministic
  Bernoulli sample.
- ``stratified_sample``: per-stratum rates (e.g. language rebalancing /
  domain mixing: keep 60% of en, 30% of de, 10% elsewhere) in ONE
  row-local pass — no shuffle, no per-stratum jobs.

All row-local expressions: the only plan nodes are scan -> project ->
filter, so sampling composes with pushdown and never materializes the
corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): first 8 md5 hex digits of
    the key's string form, mod buckets. Engine-portable (DuckDB:
    ``CAST('0x' || substr(md5(k), 1, 8) AS BIGINT) % buckets``)."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
    return (h.cast("bigint") % buckets).alias("bucket")


def hash_sample(
    df: DataFrame, id_col: str, pct: int, buckets: int = 100
) -> DataFrame:
    """Keep ~pct% of rows, decided only by the id hash."""
    return df.withColumn("bucket", hash_bucket(F.col(id_col), buckets)).filter(
        F.col("bucket") < pct
    )


def mixture_rates(
    df: DataFrame, strata_col: str, targets: dict[str, float]
) -> DataFrame:
    """Per-stratum keep rates that reshape the observed stratum counts
    into the target mixture WITHOUT upsampling (domain mixing: "make
    the release 60% en / 25% de / 15% fr").

    The largest corpus achievable by downsampling only is
    ``N* = min_s(n_s / w_s)``; each stratum keeps ``w_s * N* / n_s`` of
    its rows (1.0 for the binding stratum). Strata absent from
    ``targets`` are excluded (rate would be 0). Feed the resulting
    rates into ``stratified_sample``-style hash filters.

    Returns (strata_col, n_docs, target_w, keep_rate), ratios rounded
    to 6dp. Plan: one groupBy count (map-side combinable), a 1-row
    aggregate for N*, and a broadcast of that scalar — the corpus is
    touched exactly once.
    """
    w = F.lit(None).cast("double")
    for value, share in sorted(targets.items()):
        w = F.when(F.col(strata_col) == value, F.lit(float(share))).otherwise(w)
    counts = (
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).cast("double").alias("_n"))
        .withColumn("_w", w)
        .filter(F.col("_w").isNotNull())
    )
    nstar = counts.agg(F.min(F.col("_n") / F.col("_w")).alias("_nstar"))
    return counts.crossJoin(F.broadcast(nstar)).select(
        strata_col,
        F.col("_n").cast("bigint").alias("n_docs"),
        F.round(F.col("_w"), 6).alias("target_w"),
        F.round(
            F.least(F.col("_w") * F.col("_nstar") / F.col("_n"), F.lit(1.0)), 6
        ).alias("keep_rate"),
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, int],
    default_pct: int = 0,
    buckets: int = 100,
) -> DataFrame:
    """Per-stratum hash sampling: keep rate[stratum]% of each stratum.

    The rate table is a literal CASE chain (strata sets are small:
    languages, sources, quality bins) — one row-local filter, zero
    shuffles, skew-immune at any corpus size.
    """
    rate = F.lit(default_pct)
    for value, pct in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(pct)).otherwise(rate)
    return (
        df.withColumn("bucket", hash_bucket(F.col(id_col), buckets))
        .withColumn("rate_pct", rate.cast("int"))
        .filter(F.col("bucket") < F.col("rate_pct"))
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    shard_size: int | None = None,
) -> DataFrame:
    """Deterministic global permutation of a corpus — the "shuffle the
    training data" step that precedes sequence packing, as a seeded,
    reproducible rank instead of an unstable ``rand()`` sort.

    Each row's sort key is ``md5(id || '-' || seed)``: uniformly
    distributed (so the global sort range-partitions evenly, no skew by
    construction) and a pure function of (id, seed), so the permutation
    is identical across runs, partitionings, and engines. The rank is
    computed by the two-phase ``surrogate_key_scalable`` pattern —
    parallel range-sort, per-partition row_number, partition-count
    prefix offsets — never a single global window.

    Returns ``(id_col, shuffle_pos)`` with 1-based dense positions,
    plus ``shard = (shuffle_pos - 1) div shard_size`` when
    ``shard_size`` is given (the shuffled-corpus shard-file assignment).
    """
    from .surrogate_keys import surrogate_key_scalable

    keyed = df.select(
        F.col(id_col),
        F.md5(
            F.concat_ws("-", F.col(id_col).cast("string"), F.lit(str(seed)))
        ).alias("_skey"),
    )
    ranked = surrogate_key_scalable(
        keyed, "shuffle_pos", ["_skey", id_col]
    ).select(id_col, "shuffle_pos")
    if shard_size is None:
        return ranked
    return ranked.withColumn(
        "shard", F.expr(f"(shuffle_pos - 1) div {shard_size}")
    )


def leakage_safe_split(
    assignments: DataFrame,
    id_col: str,
    group_col: str,
    test_pct: int = 10,
    buckets: int = 100,
) -> DataFrame:
    """(id, group, bucket, side): train/test split decided by the hash
    of the GROUP (near-dup cluster, url domain, author...), never the
    row — so near-duplicate documents can never straddle the split and
    leak training text into evaluation. The standard eval-hygiene step
    after clustering a corpus.

    Same determinism contract as ``hash_sample``: the side depends only
    on the group key, so it is stable across reruns, repartitions, and
    engines, and a corpus INCREMENT lands each new document on the same
    side as its existing cluster. Row-local (scan -> project): the
    grouping join is whatever produced ``assignments``; this adds no
    shuffle.
    """
    return assignments.select(
        id_col,
        group_col,
        hash_bucket(F.col(group_col), buckets).alias("bucket"),
    ).withColumn(
        "side",
        F.when(F.col("bucket") < test_pct, F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def temperature_mixture_rates(
    df: DataFrame, strata_col: str, alpha: float = 0.3
) -> DataFrame:
    """Temperature-based mixture reweighting (the multilingual sampling
    rule of mBERT/XLM-R/mC4): target shares are DERIVED from the
    observed stratum sizes as ``w_s = n_s^alpha / sum_t(n_t^alpha)``
    instead of hand-specified — ``alpha < 1`` upweights tails (rare
    languages/domains) and ``alpha = 1`` reproduces the corpus as-is.
    The shares then feed the same no-upsampling rule as
    ``mixture_rates``: ``N* = min_s(n_s / w_s)``, each stratum keeps
    ``w_s * N* / n_s``.

    Returns (strata_col, n_docs, target_w, keep_rate); ``target_w`` and
    ``keep_rate`` are rounded to 6 dp, the binding (smallest
    ``n_s/w_s``) stratum keeps 1.0.

    Plan: one groupBy count (map-side combinable), a one-row aggregate
    for the share denominator and another for N*, each joined back by
    broadcast — the corpus is touched exactly once, everything after
    the count is |strata|-sized.
    """
    counts = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("double").alias("_n")
    )
    pow_n = F.pow(F.col("_n"), F.lit(float(alpha)))
    denom = counts.agg(F.sum(pow_n).alias("_denom"))
    shares = counts.crossJoin(F.broadcast(denom)).select(
        strata_col,
        "_n",
        F.round(pow_n / F.col("_denom"), 6).alias("_w"),
    )
    # try_divide: a stratum so small its 6dp-rounded share is 0.0 must
    # not ANSI-crash the binding-stratum scan — NULL is ignored by MIN
    # (and its keep_rate is 0 via w = 0), matching the oracle where
    # n/0.0 is +inf and never the minimum.
    nstar = shares.agg(
        F.min(F.try_divide(F.col("_n"), F.col("_w"))).alias("_nstar")
    )
    return shares.crossJoin(F.broadcast(nstar)).select(
        strata_col,
        F.col("_n").cast("bigint").alias("n_docs"),
        F.col("_w").alias("target_w"),
        F.round(
            F.least(F.col("_w") * F.col("_nstar") / F.col("_n"), F.lit(1.0)), 6
        ).alias("keep_rate"),
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k items:
    the A-Res scheme of Efraimidis & Spirakis (IPL 2006) — each row
    draws key ``u^(1/w)`` with u uniform in (0,1), and the k largest
    keys are exactly a weighted sample without replacement.

    The uniform is hash-derived, not ``rand()``: u = (bucket + 1) /
    (M + 1) over the md5 bucket of the id (M = 2^31 buckets), so the
    sample is a pure function of (id, weight) — reproducible across
    runs, partitionings, and engines, like every sampler here.

    Ranking uses the LOG key ``ln(u)/w`` (monotone in ``u^(1/w)``
    because ln is increasing and 1/w > 0, so the selected set is
    identical) rather than the raw power: for large weights the raw
    keys all crowd into a sliver below 1.0 and rounding them for
    engine portability created mass ties that the id tiebreak then
    resolved by LOWEST ID — biasing the sample toward low ids. The log
    key spreads that sliver back over a wide range, so the 12-dp
    rounding (needed for a cross-engine total order) almost never
    ties; any residual tie within 1e-12 still falls back to the id
    tiebreak, a deliberate, documented quantization bias of measure
    ~1e-12 per row rather than the previous mass-tie artifact.

    Rows with NULL or non-positive weight are excluded (they carry no
    sampling mass). Returns (id_col, weight_col, sample_key, rank).

    Scale shape: key computation is row-local; the top-k is
    ORDER BY + LIMIT, which Spark plans as TakeOrderedAndProject —
    per-partition heaps of size k, never a global sort.
    """
    from pyspark.sql import Window

    m = 2_147_483_648  # 2^31 hash buckets for the uniform draw
    u = (hash_bucket(F.col(id_col), m).cast("double") + F.lit(1.0)) / F.lit(
        float(m + 1)
    )
    w = F.col(weight_col).cast("double")
    key = F.round(F.log(u) / w, 12)
    return (
        df.filter(w.isNotNull() & (w > 0))
        .select(
            F.col(id_col),
            F.col(weight_col),
            key.alias("sample_key"),
        )
        .orderBy(F.desc("sample_key"), F.asc(id_col))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number()
            .over(
                Window.orderBy(F.desc("sample_key"), F.asc(id_col))
            )
            .cast("long"),
        )
    )
