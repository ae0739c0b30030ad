"""Streaming ANN cell assignment: route each arriving embedding to its
nearest IVF centroid — the ingestion step of a continuously-fed vector
index (new embeddings land in the right cell as they arrive; the
cell-confined search and SemDeDup operators then work incrementally).

The batch ``operators.similarity.ivf_assign`` ranks a crossJoin with a
per-vector window — not legal on a streaming DataFrame (row_number needs
a complete partition). With a STATIC centroid set the argmax does not
need a join at all: the centroids become an array-of-structs literal and
the best cell is a row-local ``F.aggregate`` fold — a pure projection,
zero shuffles, valid on batch and streaming frames alike, and exactly
equal to the batch operator's (rounded-cosine DESC, centroid_id ASC)
ranking (stream=batch equality is tested).

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
    DESC, centroid_id ASC on ties.
    """
    if not centroid_rows:
        raise ValueError("centroid_rows must be non-empty")
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
        better = (
            acc["cosine"].isNull()
            | (cos > acc["cosine"])
            | ((cos == acc["cosine"]) & (c["centroid_id"] < acc["centroid_id"]))
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
    output mode, needs no watermark, and keeps whole-stage codegen."""
    best = nearest_centroid_expr(centroid_rows, vec_col=vec_col)
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        best["centroid_id"].alias("centroid_id"),
        best["cosine"].alias("cosine"),
    )
