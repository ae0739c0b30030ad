"""Streaming ANN cell assignment: route each arriving embedding to its
nearest IVF centroid — the ingestion step of a continuously-fed vector
index (new embeddings land in the right cell as they arrive; the
cell-confined search and SemDeDup operators then work incrementally).

Two streaming-legal forms, chosen by centroid-set size:

1. ``assign_cells_stream`` — the centroids become an array-of-structs
   PLAN LITERAL and the best cell is a row-local ``F.aggregate`` fold: a
   pure projection, zero shuffles, valid on batch and streaming frames
   alike, exactly equal to the batch operator's (rounded-cosine DESC,
   centroid_id ASC) ranking (stream=batch equality is tested). Only
   legal for ingest-sized centroid sets: the literal ships inside the
   query plan, and an oversized list blows up plan compilation/codegen
   long before execution — so the constructor now REFUSES more than
   ``MAX_LITERAL_CENTROIDS`` centroids instead of failing obscurely.
2. ``assign_cells_foreach_batch`` — for real index-scale centroid sets
   (a 100 TB corpus IVF has 10^4-10^6 centroids): ``foreachBatch``
   re-reads the centroid TABLE each micro-batch and runs the batch
   ``ivf_assign`` plan (broadcast-centroids crossJoin + per-vector
   window — legal inside foreachBatch, where each micro-batch is an
   ordinary batch DataFrame). Because the centroids are re-read per
   epoch, index retraining between micro-batches is picked up
   automatically — the stream-side centroid REFRESH a live ingest
   needs. Output is partitioned by epoch and dynamically overwritten,
   so a replayed micro-batch (foreachBatch is at-least-once) rewrites
   its own epoch partition instead of duplicating rows.

The fold is the STREAMING-legal form, not a batch optimization —
measured on a 50k-vector x 516-centroid corpus, the batch
crossJoin+window plan is ~5x FASTER than folding: Spark evaluates
higher-order-function lambdas interpreted (outside whole-stage
codegen), while the crossJoin pipeline runs the same cosine arithmetic
codegen'd, and `WindowGroupLimit Partial` already reduces each map
partition to its per-key top-k BEFORE the exchange, so the feared
"shuffle all n x |centroids| scored rows" does not actually happen.
Use this operator where a window is illegal (streams) or the centroid
set is ingest-sized; keep ``ivf_assign`` for batch. Both forms are
value-identical (equality-tested).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity

#: Hard ceiling on the plan-literal centroid form. Each centroid embeds
#: |dims| float literals into the plan; past a couple thousand centroids
#: the generated expression tree slows analysis/codegen superlinearly
#: and can exceed JVM method limits — an opaque failure mode. Real IVF
#: indexes at 100 TB carry 10^4-10^6 centroids: those must use
#: ``assign_cells_foreach_batch`` (centroids as a broadcast-joined
#: TABLE, not a literal).
MAX_LITERAL_CENTROIDS = 2048

#: Sort key sentinel: rounded cosines live in [-1, 1], so -inf orders a
#: NULL cosine (zero-norm vector -> 0/0 division -> NULL) below every
#: real score — the same total order as the batch window's
#: ``ORDER BY cosine DESC NULLS LAST, centroid_id ASC``.
_NEG_INF = float("-inf")


def nearest_centroid_expr(
    centroid_rows: Sequence[tuple[int, Sequence[float]]],
    vec_col: str = "embedding",
) -> Column:
    """Column expression: struct(centroid_id, cosine) of the nearest
    centroid for the vector in ``vec_col``.

    ``centroid_rows`` is the driver-side centroid list [(id, vector)] —
    the same handful-of-KB payload the batch path broadcasts; embedded
    as a literal it ships with the plan instead of a broadcast exchange.
    Ranking matches ``ivf_assign`` exactly: cosine rounded to 6 places
    DESC with NULLs last, centroid_id ASC on ties — including degenerate
    zero-norm vectors, whose cosine is NULL against every centroid: the
    fold coalesces NULL scores to -inf so they tie, and the id tiebreak
    picks the SMALLEST centroid_id, exactly as the batch window does.

    Raises ``ValueError`` for empty input or more than
    ``MAX_LITERAL_CENTROIDS`` centroids (use
    ``assign_cells_foreach_batch`` for index-scale centroid sets).
    """
    if not centroid_rows:
        raise ValueError("centroid_rows must be non-empty")
    if len(centroid_rows) > MAX_LITERAL_CENTROIDS:
        raise ValueError(
            f"{len(centroid_rows)} centroids exceed MAX_LITERAL_CENTROIDS="
            f"{MAX_LITERAL_CENTROIDS}: a plan-embedded centroid literal this "
            "large degrades/breaks plan compilation. Use "
            "assign_cells_foreach_batch, which broadcast-joins the centroid "
            "table per micro-batch instead."
        )
    arr = F.array(
        *[
            F.struct(
                F.lit(int(cid)).cast("long").alias("centroid_id"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("cvec"),
            )
            for cid, vec in centroid_rows
        ]
    )
    init = F.struct(
        F.lit(None).cast("long").alias("centroid_id"),
        F.lit(None).cast("double").alias("cosine"),
    )

    def step(acc: Column, c: Column) -> Column:
        cos = F.round(cosine_similarity(F.col(vec_col), c["cvec"]), 6)
        # Compare through a NULL-free total order (NULL -> -inf); the
        # stored cosine stays NULL so output values match the batch op.
        cos_key = F.coalesce(cos, F.lit(_NEG_INF))
        acc_key = F.coalesce(acc["cosine"], F.lit(_NEG_INF))
        better = (
            acc["centroid_id"].isNull()
            | (cos_key > acc_key)
            | (
                (cos_key == acc_key)
                & (c["centroid_id"] < acc["centroid_id"])
            )
        )
        return F.when(
            better,
            F.struct(
                c["centroid_id"].alias("centroid_id"), cos.alias("cosine")
            ),
        ).otherwise(acc)

    return F.aggregate(arr, init, step)


def assign_cells_stream(
    embeddings: DataFrame,
    centroid_rows: Sequence[tuple[int, Sequence[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid_id, cosine) per arriving embedding — the streaming
    counterpart of ``ivf_assign``. Stateless projection: works under any
    output mode, needs no watermark, and keeps whole-stage codegen.
    Centroid-set size is capped (``MAX_LITERAL_CENTROIDS``); see
    ``assign_cells_foreach_batch`` for index-scale centroid tables."""
    best = nearest_centroid_expr(centroid_rows, vec_col=vec_col)
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        best["centroid_id"].alias("centroid_id"),
        best["cosine"].alias("cosine"),
    )


def assign_cells_foreach_batch(
    embeddings_stream: DataFrame,
    centroids_path: str,
    out_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
):
    """Streaming cell assignment for LARGE centroid sets: each
    micro-batch broadcast-joins the centroid TABLE (re-read from
    ``centroids_path`` every epoch) through the batch ``ivf_assign``
    plan — windows are legal inside ``foreachBatch`` because the
    micro-batch is an ordinary batch DataFrame.

    Properties the plan-literal form cannot provide:

    - **No centroid ceiling.** The centroids travel as a broadcast
      exchange sized by the data, not as plan text; 10^4-10^6 centroids
      (the real shape of a 100 TB IVF index) are fine.
    - **Centroid refresh.** The parquet read happens inside the epoch
      handler, so a retrain that overwrites ``centroids_path`` between
      micro-batches is picked up by the NEXT epoch with no stream
      restart — assignments always reflect the current index.
    - **Idempotent output.** Rows land under ``epoch_id=N`` partitions
      via dynamic partition overwrite: a replayed epoch (foreachBatch is
      at-least-once) overwrites its own partition, so downstream readers
      never see duplicated assignments.

    Returns an unstarted ``DataStreamWriter``; ``.start()`` it. Output
    schema: (vec_id, centroid_id, cosine) partitioned by epoch_id.
    """
    from ..operators.similarity import ivf_assign

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        centroids = spark.read.parquet(centroids_path)
        assigned = ivf_assign(
            batch_df, centroids, id_col=id_col, vec_col=vec_col, dim=dim
        )
        (
            assigned.withColumn("epoch_id", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(out_path)
        )

    return (
        embeddings_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
