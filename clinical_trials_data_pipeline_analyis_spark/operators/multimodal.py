"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The Spark-side architecture is real and tested — schema, partitioning,
Arrow-batched ``mapInPandas`` UDF signature, output StructType — while the
actual media decode is STUBBED (image/audio libraries are not available in
this environment): ``decode_image_metadata`` runs a deterministic fake
decoder, and ``decode_image_real`` raises NotImplementedError with the
integration contract documented.

At scale this is the right shape: binary payloads stay columnar
(Parquet binary), batches cross to Python once via Arrow, and the decode
parallelism is the file-scan parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: metadata schema emitted by the decode stage. Every metadata field is
#: nullable: a NULL payload (missing/undecodable media) keeps its row
#: with NULL metadata — dropping it would silently shrink the corpus.
MEDIA_METADATA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def _nullable_len(payloads: pd.Series) -> pd.Series:
    """Byte length as a pandas nullable Int64 — None payloads (missing
    media) map to <NA> and propagate through the arithmetic instead of
    raising ``len(None)``."""
    return payloads.map(
        lambda b: len(b) if b is not None else None
    ).astype("Int64")


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: encode the text column as an opaque
    binary payload column (stand-in for image/audio bytes).

    Repartitioned so the downstream Arrow/mapInPandas decode parallelizes
    across executors instead of inheriting a single file split. The target
    is capped: each partition becomes a Python worker invocation, and for
    small tables worker spin-up dominates (32 workers on 5k rows measured
    6x slower than 8)."""
    target = min(max(df.sparkSession.sparkContext.defaultParallelism, 2), 8)
    return df.repartition(target).withColumn(
        "payload", F.encode(F.col(text_col), "UTF-8")
    )


def decode_image_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Extract typed metadata from the binary payload via Arrow-batched
    ``mapInPandas``.

    The decode itself is a deterministic FAKE (byte-derived width/height)
    — swap ``_fake_decode`` for a real PIL/ffmpeg call in an environment
    that has them; everything else (batching, schema, parallelism) is the
    production path.
    """

    def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = _nullable_len(pdf["payload"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": n,
                    "format": [
                        None if pd.isna(x) else "fake/raw" for x in n
                    ],
                    "width": (n % 640 + 1).astype("Int32"),
                    "height": (n % 480 + 1).astype("Int32"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        _fake_decode, schema=MEDIA_METADATA_SCHEMA
    )


def decode_image_real(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Real decode integration point (requires PIL/opencv — not in this
    container)."""
    raise NotImplementedError(
        "Real image decode requires an imaging library (PIL/opencv). "
        "Plug the decoder into decode_image_metadata's mapInPandas body; "
        "the schema, batching and partitioning here are production-ready."
    )


#: schema emitted by the resize stage
RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("thumb_w", IntegerType(), True),
        StructField("thumb_h", IntegerType(), True),
    ]
)


def resize_image_metadata(
    df: DataFrame,
    id_col: str = "doc_id",
    max_w: int = 64,
    max_h: int = 64,
) -> DataFrame:
    """Aspect-fit thumbnail sizing over the Arrow-batched decode path.

    Same contract as ``decode_image_metadata``: the pixel work is a
    deterministic FAKE (dims derived from payload length, integer
    milli-scale aspect-fit, never upscaled), the plumbing — binary
    column in, Arrow batch crossing, typed struct out — is the
    production path a real PIL ``Image.thumbnail`` call would use.
    Integer-only math keeps the output exactly reproducible by SQL.
    """

    def _fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = _nullable_len(pdf["payload"])
            w = (n % 640 + 1).astype("Int64")
            h = (n % 480 + 1).astype("Int64")
            scale = (max_w * 1000 // w).clip(upper=max_h * 1000 // h).clip(upper=1000)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": w.astype("Int32"),
                    "height": h.astype("Int32"),
                    "thumb_w": (w * scale // 1000).clip(lower=1).astype("Int32"),
                    "thumb_h": (h * scale // 1000).clip(lower=1).astype("Int32"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        _fake_resize, schema=RESIZE_SCHEMA
    )


#: schema emitted by the frame-sampling stage
FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("byte_off", LongType(), False),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    frame_bytes: int = 1024,
    every_n: int = 4,
) -> DataFrame:
    """Frame sampling for audio/video payloads: treat the binary payload
    as consecutive ``frame_bytes`` frames and emit every ``every_n``-th
    frame's (index, byte offset) — the fan-out stage a video pipeline
    runs before per-frame decode. One Arrow crossing; the row explosion
    happens inside the pandas batch, so the Python boundary is paid per
    BATCH, not per frame.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                if payload is None:
                    continue  # missing media: no frames to sample
                n_frames = (len(payload) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every_n):
                    ids.append(int(doc_id))
                    idxs.append(i)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "byte_off": pd.array(
                        [i * frame_bytes for i in idxs], dtype="int64"
                    ),
                }
            )

    return df.select(id_col, "payload").mapInPandas(_sample, schema=FRAME_SCHEMA)
