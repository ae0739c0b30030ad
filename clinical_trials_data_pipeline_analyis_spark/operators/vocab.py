"""Vocabulary construction and OOV statistics for tokenizer pipelines.

Tokenizer training starts from corpus-wide token frequencies; the
standard vocabulary rule keeps the most frequent tokens until a target
fraction of all token *instances* is covered, then every downstream
document is scored for its out-of-vocabulary rate (a routing / quality
signal: high-OOV documents are mis-languaged, code-mixed, or junk).

Scale shape:

- the frequency table shuffles DISTINCT tokens, never token instances
  (map-side partial counts combine first) — the same rule as
  ``operators/repetition.py``;
- the coverage cutoff needs a prefix sum over tokens ranked by count.
  A bare ``Window.orderBy(...)`` would drag every distinct token
  through ONE task, so ``ranked_cumsum`` is the two-phase form:
  range-repartition on the rank order, per-partition window sums in
  parallel, then a tiny per-partition-totals offset table broadcast
  back (same pattern as ``operators/packing.py``, keyed by physical
  partition instead of id bucket because the order key is a count,
  not a dense id);
- the cutoff itself is integer arithmetic (``cum_before * 10_000 <
  coverage_bp * total``) — no float comparison that could flip a
  boundary token between engines or between runs;
- the vocabulary (the only thing joined back to the corpus) is by
  construction a small fraction of distinct tokens -> broadcast join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..checkpoint import cut_lineage

from ..functions.text import bpe_ish_tokens, normalized_text


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) — one row per token INSTANCE (not distinct), BPE-ish
    pre-tokenization over normalized text."""
    return df.select(
        id_col,
        F.explode(bpe_ish_tokens(normalized_text(F.col(text_col)))).alias(
            "token"
        ),
    )


def token_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(token, cnt) corpus-wide instance counts."""
    return (
        _doc_tokens(df, id_col, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ranked_cumsum(
    counts: DataFrame,
    order: list[Column],
    value_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``cum`` = running sum of ``value_col`` under the total order
    ``order``, without a single-partition global window.

    Phase 1: ``repartitionByRange`` on the order keys — rows land in
    physical partitions that tile the total order, so a window keyed by
    ``spark_partition_id()`` computes each partition's LOCAL prefix sums
    in parallel. Phase 2: per-partition totals (one row per partition)
    get their own cumulative offsets and broadcast back. Correctness
    does not depend on where the range sampler places the boundaries —
    only on the ranges being ordered, which RangePartitioner guarantees
    (partition 0 holds the first range of the order).

    ``num_partitions`` defaults to Spark's own choice (shuffle
    partitions, AQE-coalesced when the table is small — correct either
    way); set it explicitly to force the parallel shape.
    """
    range_args = order if num_partitions is None else [num_partitions, *order]
    # Materialize the ranged table ONCE: both the within-partition
    # window and the offsets aggregate read it, and a re-executed range
    # shuffle could (in principle) re-sample different boundaries —
    # spark_partition_id() must mean the same thing in both branches.
    parts = (
        counts.repartitionByRange(*range_args)
        .withColumn("_pid", F.spark_partition_id())
        .transform(cut_lineage())
    )
    w_in = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = parts.withColumn("_cum_in", F.sum(value_col).over(w_in))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        parts.groupBy("_pid")
        .agg(F.sum(value_col).alias("_ptotal"))
        .select(
            F.col("_pid").alias("_opid"),
            F.coalesce(F.sum("_ptotal").over(w_off), F.lit(0)).alias("_off"),
        )
    )
    return (
        within.join(F.broadcast(offsets), F.col("_pid") == F.col("_opid"))
        .withColumn("cum", F.col("_off") + F.col("_cum_in"))
        .drop("_pid", "_opid", "_cum_in", "_off")
    )


def vocab_by_coverage(
    counts: DataFrame, coverage_bp: int = 9950
) -> DataFrame:
    """(token, cnt, cum, total) for the vocabulary: most-frequent tokens
    (count DESC, token ASC tiebreak) whose cumulative coverage BEFORE
    including them is still below ``coverage_bp`` basis points — i.e.
    the smallest prefix reaching the target, boundary token included.
    """
    order = [F.col("cnt").desc(), F.col("token").asc()]
    # One pass over the corpus: the ranked table and the grand total
    # both read the materialized counts, not the explode pipeline.
    counts = counts.transform(cut_lineage())
    ranked = ranked_cumsum(counts, order, "cnt")
    total = counts.groupBy().agg(F.sum("cnt").alias("total"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .filter(
            (F.col("cum") - F.col("cnt")) * 10_000
            < F.lit(coverage_bp) * F.col("total")
        )
    )


def oov_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
) -> DataFrame:
    """(id, n_tokens, n_oov, oov_rate) per document against ``vocab``
    (any DataFrame with a ``token`` column; broadcast — a coverage
    vocabulary is small by construction). Documents with zero tokens
    keep a row with counts 0 and NULL rate.
    """
    toks = _doc_tokens(df, id_col, text_col)
    marked = toks.join(
        F.broadcast(vocab.select("token").withColumn("_in", F.lit(1))),
        "token",
        "left",
    )
    per_doc = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).alias("n_oov"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
        )
    )
