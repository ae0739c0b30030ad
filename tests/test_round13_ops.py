"""Round-13 hardening tests.

Theme 1 — filesystem-agnostic geometry sidecars (VERDICT r12 ask #1 /
ADVICE): the streaming signature stores' geometry pin must hold on ANY
filesystem the Spark session can serve, not just paths ``os.path`` can
see. The round-12 sidecar used ``os.path.exists``/``open``, which
return False / never fire on a ``file://`` (or ``hdfs://``/``s3a://``)
URI — the loud-mismatch contract silently vanished exactly where the
store is long-lived. These tests drive the new ``store_meta.
check_or_pin_geometry`` through a ``file://`` URI that ``os.path``
provably cannot see, and prove the pin still raises.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from clinical_trials_data_pipeline_analyis_spark.streaming.store_meta import (
    check_or_pin_geometry,
)


def test_geometry_pin_holds_on_nonlocal_uri(spark, tmp_path):
    """The exact round-12 failure mode: a store path os.path cannot see.

    ``file://<tmp>/store`` is a URI, not a POSIX path — os.path.exists
    returns False for it (asserted below, proving the OLD sidecar would
    have silently rewritten the marker every run). The Spark-routed pin
    must still (a) write on first contact, (b) pass on a matching
    re-check, (c) raise loudly on mismatch."""
    store = "file://" + str(tmp_path / "store")
    assert not os.path.exists(store)  # the old check's blind spot

    geo = {"n_bits": 16, "bands": 2, "dim": 64, "seed": 13}
    check_or_pin_geometry(spark, store, "_rhp_geometry", geo, "op")
    assert not os.path.exists(store)  # still invisible to os.path...
    assert (tmp_path / "store" / "_rhp_geometry").exists()  # ...but real

    # matching re-check: no raise
    check_or_pin_geometry(spark, store, "_rhp_geometry", dict(geo), "op")

    # mismatch: loud, names both geometries
    with pytest.raises(ValueError, match="geometry"):
        check_or_pin_geometry(
            spark, store, "_rhp_geometry", {**geo, "seed": 99}, "op"
        )


def test_geometry_pin_reads_legacy_local_marker(spark, tmp_path):
    """Back-compat: a round-12 marker (bare one-line JSON object written
    by ``json.dump``) is valid json-lines — stores pinned by the old
    code keep their pin under the new reader."""
    store = tmp_path / "store"
    store.mkdir()
    geo = {"n_bits": 16, "bands": 2, "dim": 64, "seed": 13}
    with open(store / "_rhp_geometry", "w", encoding="utf-8") as fh:
        json.dump(geo, fh)

    check_or_pin_geometry(spark, str(store), "_rhp_geometry", geo, "op")
    with pytest.raises(ValueError, match="geometry"):
        check_or_pin_geometry(
            spark, str(store), "_rhp_geometry", {**geo, "bands": 4}, "op"
        )


def test_geometry_pin_refuses_corrupt_marker(spark, tmp_path):
    """A marker whose fields cannot be read (wrong keys / truncated)
    surfaces as NULLs — the pin must refuse rather than continue over a
    store whose geometry cannot be PROVEN to match."""
    store = tmp_path / "store"
    store.mkdir()
    with open(store / "_rhp_geometry", "w", encoding="utf-8") as fh:
        fh.write('{"some_other_key": 1}\n')  # parseable, wrong fields
    with pytest.raises(ValueError, match="geometry"):
        check_or_pin_geometry(
            spark, str(store), "_rhp_geometry",
            {"n_bits": 16, "bands": 2}, "op",
        )
    with open(store / "_rhp_geometry", "w", encoding="utf-8") as fh:
        fh.write('{"n_bits": 1')  # truncated — unparseable
    with pytest.raises(ValueError, match="unreadable"):
        check_or_pin_geometry(
            spark, str(store), "_rhp_geometry",
            {"n_bits": 16, "bands": 2}, "op",
        )


def _doc_chunks(spark, tmp_path):
    """Two parquet chunk files of documents with a cross-chunk near-dup."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "completely different content about spark structured streaming"),
        (3, "the quick brown fox jumps over the lazy dog again and again!"),
        (4, "yet another unrelated document with its own distinct words"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    chunks = str(tmp_path / "chunks")
    df.filter(F.col("doc_id") <= 2).coalesce(1).write.parquet(f"{chunks}/c1")
    df.filter(F.col("doc_id") >= 3).coalesce(1).write.parquet(f"{chunks}/c2")
    return df.schema, chunks


def test_minhash_stream_geometry_pinned(spark, tmp_path):
    """near_dedup_docs_stream now pins (num_hashes, bands, shingle_k):
    a restart over a live store with different bands fails loudly."""
    import shutil

    from pyspark.errors import StreamingQueryException

    from clinical_trials_data_pipeline_analyis_spark.streaming import (
        near_dedup_docs_stream,
    )

    schema, chunks = _doc_chunks(spark, tmp_path)
    out, store, ckpt = (
        str(tmp_path / "flags"), str(tmp_path / "store"), str(tmp_path / "ckpt")
    )

    def run(bands=4):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{chunks}/c*")
        )
        q = near_dedup_docs_stream(
            stream, out_path=out, store_path=store, checkpoint=ckpt,
            bands=bands,
        ).start()
        q.awaitTermination(120)

    run()
    flags = {r["doc_id"]: r["is_near_dup"] for r in spark.read.parquet(out).collect()}
    assert flags[3] and not flags[1]

    shutil.rmtree(ckpt)
    with pytest.raises(StreamingQueryException, match="geometry"):
        run(bands=2)


def test_span_stream_geometry_pinned(spark, tmp_path):
    """clean_spans_stream pins k the same way."""
    import shutil

    from pyspark.errors import StreamingQueryException

    from clinical_trials_data_pipeline_analyis_spark.streaming import (
        clean_spans_stream,
    )

    schema, chunks = _doc_chunks(spark, tmp_path)
    out, store, ckpt = (
        str(tmp_path / "clean"), str(tmp_path / "ghstore"), str(tmp_path / "ckpt2")
    )

    def run(k=5):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{chunks}/c*")
        )
        q = clean_spans_stream(
            stream, out_path=out, store_path=store, checkpoint=ckpt, k=k
        ).start()
        q.awaitTermination(120)

    run()
    assert spark.read.parquet(out).count() == 4

    shutil.rmtree(ckpt)
    with pytest.raises(StreamingQueryException, match="geometry"):
        run(k=7)
