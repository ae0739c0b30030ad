"""Crafted-input and scale-hardening tests for the round-5 operators:
SCD2, vocab/OOV (two-phase ranked prefix sum), binned quantiles,
duplicate-ngram coverage, embedding dimension stats."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from clinical_trials_data_pipeline_analyis_spark.operators.dedup import dup_ngram_coverage
from clinical_trials_data_pipeline_analyis_spark.operators.scd import scd2_from_log
from clinical_trials_data_pipeline_analyis_spark.operators.similarity import (
    embedding_dim_stats,
)
from clinical_trials_data_pipeline_analyis_spark.operators.sketches import binned_quantiles
from clinical_trials_data_pipeline_analyis_spark.operators.vocab import (
    oov_stats,
    ranked_cumsum,
    token_frequencies,
    vocab_by_coverage,
)
from conftest import SF_DIR


def test_scd2_crafted_log(spark):
    """Null attributes, same-timestamp ties, and unchanged repeats: the
    first observation always opens version 1 (even NULL), NULL<->value
    transitions are changes, consecutive repeats collapse."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: a, a (collapse), b, b (collapse), a  -> 3 versions
        (1, "a", t0, 1),
        (1, "a", t0 + dt.timedelta(hours=1), 2),
        (1, "b", t0 + dt.timedelta(hours=2), 3),
        (1, "b", t0 + dt.timedelta(hours=3), 4),
        (1, "a", t0 + dt.timedelta(hours=4), 5),
        # user 2: NULL first obs, then NULL again (collapse), then x
        (2, None, t0, 6),
        (2, None, t0 + dt.timedelta(hours=1), 7),
        (2, "x", t0 + dt.timedelta(hours=2), 8),
        # user 3: timestamp tie broken by event id — y then z at t0
        (3, "y", t0, 9),
        (3, "z", t0, 10),
    ]
    log = spark.createDataFrame(
        rows, "user_id BIGINT, attr_in STRING, ts TIMESTAMP_NTZ, eid BIGINT"
    )
    out = scd2_from_log(log, "user_id", "attr_in", "ts", "eid")
    got = {
        (r["user_id"], r["version"]): (
            r["attr"],
            r["valid_from"],
            r["valid_to"],
            r["is_current"],
        )
        for r in out.collect()
    }
    assert len(got) == 7
    h = dt.timedelta(hours=1)
    assert got[(1, 1)] == ("a", t0, t0 + 2 * h, False)
    assert got[(1, 2)] == ("b", t0 + 2 * h, t0 + 4 * h, False)
    assert got[(1, 3)] == ("a", t0 + 4 * h, None, True)
    assert got[(2, 1)] == (None, t0, t0 + 2 * h, False)
    assert got[(2, 2)] == ("x", t0 + 2 * h, None, True)
    # tie at t0: eid order makes y version 1 closed AT t0 by z
    assert got[(3, 1)] == ("y", t0, t0, False)
    assert got[(3, 2)] == ("z", t0, None, True)
    # exactly one current row per entity
    cur = out.filter("is_current").groupBy("user_id").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_ranked_cumsum_two_phase_equals_global_window(spark):
    """The range-partitioned two-phase prefix sum must equal the
    single-partition global window exactly, at a size that forces
    multiple range partitions."""
    counts = (
        spark.range(0, 5000)
        .select(
            F.concat(F.lit("tok"), F.col("id")).alias("token"),
            # heavy ties: many tokens share a count -> tiebreak matters
            (F.col("id") % 97 + 1).alias("cnt"),
        )
    )
    order = [F.col("cnt").desc(), F.col("token").asc()]
    # explicit partition count: forces the multi-partition shape even
    # though AQE would coalesce a table this small to one partition
    got = ranked_cumsum(counts, order, "cnt", num_partitions=8)
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = counts.withColumn("cum", F.sum("cnt").over(w))
    g = {r["token"]: r["cum"] for r in got.collect()}
    e = {r["token"]: r["cum"] for r in want.collect()}
    assert g == e


def test_vocab_includes_boundary_token_and_oov_consistency(spark):
    """The vocabulary is the SMALLEST most-frequent-first prefix whose
    coverage reaches the target (boundary token included), and OOV
    counts agree with a direct membership check."""
    docs = spark.createDataFrame(
        [
            (1, "aa aa aa aa bb bb cc"),
            (2, "aa bb cc dd"),
            (3, ""),
        ],
        "doc_id BIGINT, text STRING",
    )
    counts = token_frequencies(docs, "doc_id", "text")
    # totals: aa=5, bb=3, cc=2, dd=1 (11 instances)
    vocab = vocab_by_coverage(counts, coverage_bp=8000)
    toks = sorted(r["token"] for r in vocab.collect())
    # cum_before(aa)=0, (bb)=5/11=45%, (cc)=8/11=72.7% < 80% -> cc IS
    # included (boundary token), dd's cum_before=10/11=90.9% -> excluded
    assert toks == ["aa", "bb", "cc"]
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in oov_stats(docs, "doc_id", "text", vocab).collect()
    }
    assert out[1] == (7, 0, 0.0)
    assert out[2] == (4, 1, 0.25)
    assert out[3] == (0, 0, None)  # zero-token doc keeps a row


def test_binned_quantiles_bound_vs_exact(spark):
    """Estimator property on real data: the upper-edge estimate is
    never below the exact quantile and overshoots by at most one bin
    width."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    width = 10.0
    est = binned_quantiles(ev, "event_type", "value", width)
    # ceil-rank (discrete) quantile — the estimator's semantics: the
    # smallest value whose CDF reaches q. Interpolated percentile() can
    # sit a full inter-value gap below it, so it is the wrong yardstick.
    disc = "sort_array(collect_list(value))[cast(ceil({q} * count(value)) as int) - 1]"
    exact = ev.groupBy("event_type").agg(
        F.expr(disc.format(q=0.5)).alias("p5000"),
        F.expr(disc.format(q=0.9)).alias("p9000"),
        F.expr(disc.format(q=0.99)).alias("p9900"),
    )
    ex = {r["event_type"]: r.asDict() for r in exact.collect()}
    rows = est.collect()
    assert len(rows) == 3 * len(ex)
    for r in rows:
        true_q = ex[r["event_type"]][f"p{r['q_bp']}"]
        assert r["est"] >= true_q - 1e-9
        assert r["est"] - true_q <= width + 1e-9


def test_binned_quantiles_merge_invariance(spark):
    """Partitioning must not affect the sketch (mergeable partial
    aggregate): 1 partition and 32 partitions give identical output."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    a = binned_quantiles(ev.coalesce(1), "event_type", "value", 10.0)
    b = binned_quantiles(ev.repartition(32), "event_type", "value", 10.0)
    ka = {(r["event_type"], r["q_bp"]): r["est"] for r in a.collect()}
    kb = {(r["event_type"], r["q_bp"]): r["est"] for r in b.collect()}
    assert ka == kb


def test_dup_ngram_coverage_crafted(spark):
    """Two identical docs share every shingle (coverage 1.0); a disjoint
    doc shares none (0.0); a doc sharing part of its text lands strictly
    between."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "entirely different words here with nothing shared"),
            (4, "the quick brown fox sleeps all day long today"),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {
        r["doc_id"]: (r["n_shingles"], r["dup_coverage"])
        for r in dup_ngram_coverage(docs, "doc_id", "text", k=3).collect()
    }
    assert out[1][1] == 1.0 and out[2][1] == 1.0
    assert out[3][1] == 0.0
    assert 0.0 < out[4][1] < 1.0


def test_embedding_dim_stats_partition_invariance(spark):
    """DECIMAL accumulation makes the stats independent of partition
    layout/merge order — the property that makes the numbers trustable
    on a real cluster."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = embedding_dim_stats(emb.coalesce(1), "embedding").collect()
    b = embedding_dim_stats(emb.repartition(32), "embedding").collect()
    ka = {r["dim"]: (r["n"], r["mean"], r["var"], r["min_v"], r["max_v"]) for r in a}
    kb = {r["dim"]: (r["n"], r["mean"], r["var"], r["min_v"], r["max_v"]) for r in b}
    assert ka == kb
    assert len(ka) == 64
    for n, mean, var, lo, hi in ka.values():
        assert var >= 0 and lo <= mean <= hi


def test_duplicate_spans_crafted(spark):
    """Two docs sharing an 8-token phrase: each reports exactly the
    phrase's token range (maximal, merged across overlapping windows);
    a doc with no repeated 5-gram reports nothing; same-doc internal
    repetition also counts."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six"),
            (2, f"{shared} nine ten eleven twelve thirteen fourteen"),
            (3, "all words here are used exactly once only ever"),
            # doc 4 repeats its own 5-gram back to back: "r1..r5 r1..r5"
            (4, "r1 r2 r3 r4 r5 r1 r2 r3 r4 r5"),
            (5, "tiny doc"),  # < k tokens: skipped entirely
        ],
        "doc_id BIGINT, text STRING",
    )
    from clinical_trials_data_pipeline_analyis_spark.operators.dedup import duplicate_spans

    out = duplicate_spans(docs, "doc_id", "text", k=5)
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in out.collect()
    }
    # doc1: shared phrase occupies tokens [3, 11)
    assert spans[1] == (3, 11, 8)
    # doc2: same phrase at [0, 8)
    assert spans[2] == (0, 8, 8)
    assert 3 not in spans
    # doc4: every 5-gram window of the doubled phrase repeats... only
    # the window "r1 r2 r3 r4 r5" (positions 0 and 5) occurs twice;
    # windows spanning the seam are unique. Islands: pos 0 and 5 merge
    # (gap == k) -> one span [0, 10).
    assert spans[4] == (0, 10, 10)
    assert 5 not in spans
    # every span row is maximal: one row per doc here
    assert out.count() == 3


def test_streaming_histogram_matches_batch_and_feeds_quantiles(
    spark, tmp_path
):
    """Stream-accumulated (group, bin) counts must equal the batch
    histogram over the union of micro-batches, and the quantile
    read-off over the streamed sink must equal the batch sketch."""
    import pandas as pd

    from clinical_trials_data_pipeline_analyis_spark.operators.sketches import (
        binned_histogram,
        binned_quantiles,
    )
    from clinical_trials_data_pipeline_analyis_spark.streaming.sketches import (
        value_histogram_stream,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    pdf = ev.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).toPandas()
    src = tmp_path / "stream_src"
    src.mkdir()
    # three micro-batch files
    for i, chunk in enumerate(
        [pdf.iloc[:300], pdf.iloc[300:700], pdf.iloc[700:]]
    ):
        chunk.to_json(src / f"b{i}.json", orient="records", lines=True)

    from clinical_trials_data_pipeline_analyis_spark.streaming.events import (
        EVENTS_STREAM_SCHEMA,
        streaming_events_source,
    )

    stream = streaming_events_source(spark, str(src))
    hist = value_histogram_stream(stream, "event_type", "value", 10.0)
    q = (
        hist.writeStream.format("memory")
        .queryName("hist_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["event_type"], r["bin"]): r["cnt"]
        for r in spark.sql("SELECT * FROM hist_sink").collect()
    }
    want = {
        (r["event_type"], r["bin"]): r["cnt"]
        for r in binned_histogram(ev, "event_type", "value", 10.0).collect()
    }
    assert got == want

    # quantile read-off over the streamed histogram == batch sketch
    from pyspark.sql import Window

    sink = spark.sql("SELECT * FROM hist_sink")
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sink.withColumns(
        {
            "cum": F.sum("cnt").over(w_cum),
            "total": F.sum("cnt").over(Window.partitionBy("event_type")),
        }
    )
    est_stream = {}
    for q_bp in (5000, 9000, 9900):
        rows = (
            cum.filter(F.col("cum") * 10_000 >= q_bp * F.col("total"))
            .groupBy("event_type")
            .agg(F.round((F.min("bin") + 1) * 10.0, 6).alias("est"))
            .collect()
        )
        for r in rows:
            est_stream[(r["event_type"], q_bp)] = r["est"]
    est_batch = {
        (r["event_type"], r["q_bp"]): r["est"]
        for r in binned_quantiles(ev, "event_type", "value", 10.0).collect()
    }
    assert est_stream == est_batch


def test_scd2_stream_matches_batch(spark, tmp_path):
    """Incremental SCD2 over micro-batches — including OUT-OF-ORDER
    event time across batches (a late observation splitting an existing
    interval) — must equal the batch operator over the union."""
    import json as _json

    from clinical_trials_data_pipeline_analyis_spark.streaming.scd import scd2_stream

    # batch 1: users 1,2 establish history; batch 2 contains a LATE
    # observation for user 1 that lands between batch-1 observations
    # and must split the collapsed 'a' run.
    b1 = [
        {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 1, "event_type": "a", "value": 1.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T02:00:00", "user_id": 1, "event_type": "a", "value": 1.0, "props": "{}"},
        {"event_id": 3, "ts": "2024-01-01T00:30:00", "user_id": 2, "event_type": "x", "value": 1.0, "props": "{}"},
    ]
    b2 = [
        {"event_id": 4, "ts": "2024-01-01T01:00:00", "user_id": 1, "event_type": "b", "value": 1.0, "props": "{}"},
        {"event_id": 5, "ts": "2024-01-01T03:00:00", "user_id": 2, "event_type": "y", "value": 1.0, "props": "{}"},
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, batch in enumerate([b1, b2]):
        (src / f"b{i}.json").write_text(
            "\n".join(_json.dumps(r) for r in batch)
        )

    # maxFilesPerTrigger=1 -> one file per micro-batch
    stream2 = (
        spark.readStream.schema(
            "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
            "value DOUBLE, props STRING"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    writer = scd2_stream(
        stream2,
        store_path=str(tmp_path / "store"),
        dim_path=str(tmp_path / "dim"),
        checkpoint=str(tmp_path / "ckpt"),
        key_col="user_id",
        attr_col="event_type",
        ts_col="ts",
        tiebreak_col="event_id",
        buckets=8,
    )
    q = writer.start()
    q.awaitTermination(120)

    from clinical_trials_data_pipeline_analyis_spark.operators.scd import scd2_from_log

    union = spark.read.schema(
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING"
    ).json(str(src))
    want = {
        (r["user_id"], r["version"]): (r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_from_log(
            union, "user_id", "event_type", "ts", "event_id"
        ).collect()
    }
    got = {
        (r["user_id"], r["version"]): (r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in spark.read.parquet(str(tmp_path / "dim")).collect()
    }
    assert got == want
    # the late 'b' really split user 1's 'a' run into three versions
    assert len([k for k in got if k[0] == 1]) == 3


def test_linear_counting_distinct_properties(spark):
    """Estimator sanity on real data: estimate within the linear-
    counting error envelope of exact, and partition-layout invariant
    (mergeable)."""
    from clinical_trials_data_pipeline_analyis_spark.functions.text import (
        bpe_ish_tokens,
        normalized_text,
    )
    from clinical_trials_data_pipeline_analyis_spark.operators.sketches import (
        linear_counting_distinct,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = docs.select(
        "source",
        F.explode(bpe_ish_tokens(normalized_text(F.col("text")))).alias(
            "token"
        ),
    )
    out = linear_counting_distinct(toks, "source", "token", m=1024).collect()
    assert len(out) > 0
    for r in out:
        assert r["est_distinct"] is not None  # far from saturation
        # loose envelope: within 15% at <40% occupancy
        assert r["rel_err"] <= 0.15
    a = {
        r["source"]: r["est_distinct"]
        for r in linear_counting_distinct(
            toks.coalesce(1), "source", "token", m=1024
        ).collect()
    }
    b = {
        r["source"]: r["est_distinct"]
        for r in linear_counting_distinct(
            toks.repartition(32), "source", "token", m=1024
        ).collect()
    }
    assert a == b
