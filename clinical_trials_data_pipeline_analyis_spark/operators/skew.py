"""Skew-handling aggregation operators (SURVEY §7 M8).

AACT condition names are zipf-skewed ("healthy volunteers"-type hot keys);
at 100 TB a plain groupBy on such a key funnels the hot group through one
reducer. Two standard remedies, both plain DataFrame compositions:

- ``salted_count``: two-phase count — partial count on (key, salt), final
  sum on key. The hot key's work spreads over ``salt_buckets`` reducers.
  Valid for any commutative/associative aggregate (sum/count/min/max).
- ``salted_count_distinct``: exact distinct via two-phase dedup — first
  distinct on (key, value) sharded by value hash, then count per key.
  This is how to spread a COUNT(DISTINCT sponsor) on a hot condition.

AQE's skew-join splitting handles the JOIN side of skew automatically
(enabled in session.py); these cover the AGGREGATION side, which AQE does
not rebalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame, key_cols: list[str], salt_buckets: int = 32
) -> DataFrame:
    """COUNT(*) per key, skew-safe: pre-aggregate on (key, salt)."""
    salted = df.withColumn(
        "_salt", (F.rand(seed=0) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_partial").alias("count")
    )


def salted_count_distinct(
    df: DataFrame,
    key_cols: list[str],
    distinct_col: str,
    salt_buckets: int = 32,
) -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) per key without funneling a hot
    key through one reducer.

    Phase 1 dedups (key, value) pairs — that shuffle hashes on BOTH
    columns, so even a single hot key spreads across reducers as long as
    its values vary. Phase 2 counts the deduped pairs per key; phase 2's
    shuffle carries one row per (key, value), already bounded by the
    distinct count. (``salt_buckets`` kept for API symmetry; the value
    hash is the salt here.)
    """
    deduped = df.select(*key_cols, distinct_col).dropDuplicates(
        [*key_cols, distinct_col]
    )
    return deduped.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("distinct_count")
    )
