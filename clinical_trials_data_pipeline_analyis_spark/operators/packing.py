"""Sequence packing: concat-and-split documents into fixed-size contexts.

LLM training consumes fixed-length token windows; the standard prep step
concatenates documents in a deterministic order and splits the stream
every ``capacity`` tokens. The operator therefore needs each document's
GLOBAL running token offset — a prefix sum over the whole corpus.

A naive ``Window.orderBy(id)`` prefix sum moves the corpus through ONE
task (Spark warns "No Partition Defined"). ``pack_sequences`` is the
scalable two-phase form, the same pattern as
``operators/surrogate_keys.py``:

1. bucket rows by id range; per-bucket prefix sums run in parallel
   (window keyed by bucket — dense, skew-free for dense ids);
2. per-bucket totals (|buckets| rows, tiny) get their own prefix sum and
   are broadcast back as starting offsets.

``global_start = bucket_offset + within_bucket_cumsum - own_tokens``;
``chunk_id = global_start div capacity`` (integer div — float division
corrupts offsets past 2^53 at real corpus sizes). Documents longer than
``capacity`` simply span chunks, exactly like the real concat-split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    capacity: int,
    bucket_size: int = 1024,
) -> DataFrame:
    """(id, token_col, global_start, chunk_id) under id order.

    ``bucket_size`` trades per-bucket window width against the size of
    the offset table (corpus_rows / bucket_size rows — broadcastable up
    to billions of docs at the default).
    """
    tokens = F.col(token_col).cast("long")
    bucketed = df.select(
        F.col(id_col), tokens.alias("_t"),
        (F.col(id_col).cast("long") - (F.col(id_col).cast("long") % bucket_size))
        .alias("_bucket"),
    )
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = bucketed.withColumn("_cum", F.sum("_t").over(w_in))

    totals = bucketed.groupBy("_bucket").agg(F.sum("_t").alias("_total"))
    w_b = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        F.col("_bucket").alias("_obucket"),
        F.coalesce(F.sum("_total").over(w_b), F.lit(0)).alias("_offset"),
    )

    packed = within.join(
        F.broadcast(offsets), F.col("_bucket") == F.col("_obucket")
    ).select(
        id_col,
        F.col("_t").alias(token_col),
        (F.col("_offset") + F.col("_cum") - F.col("_t")).alias("global_start"),
        F.expr(f"(_offset + _cum - _t) div {capacity}").alias("chunk_id"),
    )
    return packed


def chunk_spans(
    packed: DataFrame,
    id_col: str,
    token_col: str,
    capacity: int,
) -> DataFrame:
    """Materialize the chunk → document-span map from ``pack_sequences``
    output: one row per (chunk, document) intersection, i.e. the
    assembly plan a loader needs to build each fixed-size training
    context from raw documents.

    A document at ``global_start`` g with t tokens covers the token
    interval [g, g+t), which intersects chunks ``g div capacity`` ..
    ``(g+t-1) div capacity``. Per intersection:

    - ``doc_offset``  — first token of the doc that lands in this chunk;
    - ``span_start``  — where it lands inside the chunk;
    - ``span_len``    — tokens contributed to this chunk.

    Scale shape: one ``explode(sequence(first, last))`` whose fan-out is
    ``ceil(t / capacity) + 1`` rows per doc — bounded by document
    length, never by corpus size — followed by pure arithmetic. No
    shuffle beyond what ``pack_sequences`` already did; all the div
    arithmetic is integer (``div``), safe past 2^53 total tokens.
    Zero-token documents occupy no interval and produce no span row.
    """
    cap = F.lit(capacity).cast("long")
    g = F.col("global_start")
    t = F.col(token_col).cast("long")
    spans = (
        packed.filter(t > 0)
        .withColumn("_first", F.expr(f"global_start div {capacity}"))
        .withColumn(
            "_last", F.expr(f"(global_start + {token_col} - 1) div {capacity}")
        )
        .select(
            id_col,
            token_col,
            "global_start",
            F.explode(F.sequence(F.col("_first"), F.col("_last"))).alias(
                "span_chunk_id"
            ),
        )
    )
    chunk_start = F.col("span_chunk_id") * cap
    lo = F.greatest(g, chunk_start)
    hi = F.least(g + t, chunk_start + cap)
    return spans.select(
        F.col("span_chunk_id").alias("chunk_id"),
        id_col,
        (lo - g).alias("doc_offset"),
        (lo - chunk_start).alias("span_start"),
        (hi - lo).alias("span_len"),
    )


def length_bucket_batches(
    df: DataFrame,
    id_col: str,
    token_col: str,
    bucket_width: int,
    batch_size: int,
    num_shards: int = 8,
) -> DataFrame:
    """Length-bucketed inference batching: batch documents of similar
    length together so each fixed-size batch pads to its OWN max length
    instead of the corpus max — the standard trick for cutting wasted
    FLOPs in embedding/scoring passes over a corpus.

    ``bucket = tokens div bucket_width``; within a bucket, documents are
    deterministically sharded by ``md5(id) % num_shards`` (portable
    hash, invariant under partitioning) so batch numbering parallelizes
    — a single per-bucket window would funnel a popular length class
    through one task. Within (bucket, shard) documents order by
    (tokens, id) and ``batch_id = (row_number - 1) div batch_size``.

    Returns per-batch stats ``(bucket, shard, batch_id, n_docs,
    max_tokens, sum_tokens, pad_waste)`` where
    ``pad_waste = n_docs * max_tokens - sum_tokens`` — the padding the
    bucketing avoids paying at the corpus max.

    Scale shape: windows keyed by (bucket, shard) — parallelism is
    buckets × shards regardless of corpus size; the aggregate
    partial-combines map-side. No global window, no skew beyond
    1/num_shards of the most popular length class.
    """
    t = F.col(token_col).cast("long")
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long") % num_shards
    )
    rows = df.select(
        F.col(id_col).alias("_id"),
        t.alias("_t"),
        F.expr(f"cast({token_col} as long) div {bucket_width}").alias("bucket"),
        shard.alias("shard"),
    )
    w = Window.partitionBy("bucket", "shard").orderBy(F.asc("_t"), F.asc("_id"))
    batched = rows.withColumn("_rn", F.row_number().over(w)).withColumn(
        "batch_id", F.expr(f"(_rn - 1) div {batch_size}")
    )
    return batched.groupBy("bucket", "shard", "batch_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.max("_t").cast("long").alias("max_tokens"),
        F.sum("_t").cast("long").alias("sum_tokens"),
        (F.count(F.lit(1)) * F.max("_t") - F.sum("_t"))
        .cast("long")
        .alias("pad_waste"),
    )


def sliding_chunks(
    docs: DataFrame,
    size: int,
    overlap: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size sliding-window token chunks WITHIN each document —
    the retrieval/RAG chunking op (complement of ``pack_sequences``,
    which fills fixed contexts ACROSS document boundaries; retrieval
    chunking must never cross them).

    Windows start at 0, stride, 2*stride, ... for every start < n_tokens
    (stride = size - overlap); the final windows are shorter than
    ``size`` when the document runs out. Returns
    (id_col, chunk_id, start_tok, end_tok, n_chunk_tokens, chunk_text)
    with 0-based token offsets and end_tok exclusive.

    Scale shape: row-local tokenize + sequence + explode — no shuffle
    beyond the input spreading; fan-out is bounded by
    ceil(n_tokens / stride) per document, never corpus size.
    """
    if not 0 <= overlap < size:
        raise ValueError("require 0 <= overlap < size")
    stride = size - overlap
    from ..functions.text import whitespace_tokens
    from .dedup import _spread

    toks = whitespace_tokens(F.col(text_col))
    base = (
        _spread(docs)
        .select(F.col(id_col), toks.alias("_toks"))
        .select(id_col, "_toks", F.size("_toks").alias("_n"))
        .filter(F.col("_n") > 0)
    )
    starts = F.sequence(
        F.lit(0), (F.col("_n") - 1).cast("int"), F.lit(stride)
    )
    exploded = base.select(
        id_col,
        "_toks",
        "_n",
        F.posexplode(starts).alias("_pos", "_start"),
    )
    end = F.least(F.col("_start") + size, F.col("_n"))
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, size)
    return exploded.select(
        F.col(id_col),
        F.col("_pos").cast("long").alias("chunk_id"),
        F.col("_start").cast("long").alias("start_tok"),
        end.cast("long").alias("end_tok"),
        (end - F.col("_start")).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
