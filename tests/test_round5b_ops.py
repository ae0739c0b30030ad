"""Crafted-input tests for the second round-5 operator batch: DSIR
importance scores, count-min sketch, quality retention curve, and
bigram-LM document scoring. Each checks exact values against an
independent in-Python reference (hashlib md5 / decimal arithmetic), not
just shapes."""

from __future__ import annotations

import hashlib
import math
from decimal import Decimal

from pyspark.sql import functions as F

from clinical_trials_data_pipeline_analyis_spark.operators.curation import retention_curve
from clinical_trials_data_pipeline_analyis_spark.operators.importance import dsir_scores
from clinical_trials_data_pipeline_analyis_spark.operators.lm import bigram_lm_scores
from clinical_trials_data_pipeline_analyis_spark.operators.sketches import (
    cms_cells,
    cms_topk_estimates,
)
from conftest import SF_DIR


def _bucket(s: str, m: int) -> int:
    """The engine-portable md5 bucket (operators.sampling.hash_bucket)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % m


# ---------------------------------------------------------------- DSIR
def test_dsir_matches_python_reference(spark):
    docs = [
        (0, "apple apple banana", "en"),
        (1, "apple cherry", "en"),
        (2, "durian durian durian", "fr"),
        (3, "banana durian", "fr"),
    ]
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING, lang STRING")
    buckets = 512
    out = {
        r["doc_id"]: r
        for r in dsir_scores(
            df, F.col("lang") == "en", buckets=buckets
        ).collect()
    }

    # Python reference with the same smoothing and rounding discipline.
    tok_counts: dict[tuple[int, int], int] = {}
    is_tgt = {0: True, 1: True, 2: False, 3: False}
    for doc_id, text, _ in docs:
        for t in text.split():
            b = _bucket(t, buckets)
            tok_counts[(doc_id, b)] = tok_counts.get((doc_id, b), 0) + 1
    t_cnt: dict[int, int] = {}
    r_cnt: dict[int, int] = {}
    for (d, b), c in tok_counts.items():
        r_cnt[b] = r_cnt.get(b, 0) + c
        if is_tgt[d]:
            t_cnt[b] = t_cnt.get(b, 0) + c
    T = sum(t_cnt.values())
    R = sum(r_cnt.values())
    ratio = {
        b: Decimal(
            str(
                round(
                    math.log((t_cnt.get(b, 0) + 1) / (T + buckets))
                    - math.log((r_cnt[b] + 1) / (R + buckets)),
                    6,
                )
            )
        )
        for b in r_cnt
    }
    for doc_id in range(4):
        score = sum(
            c * ratio[b] for (d, b), c in tok_counts.items() if d == doc_id
        )
        n_tok = sum(c for (d, _), c in tok_counts.items() if d == doc_id)
        row = out[doc_id]
        assert row["n_tokens"] == n_tok
        assert row["is_target"] == is_tgt[doc_id]
        assert abs(row["dsir_score"] - float(score)) < 1e-9
    # Target-only vocabulary must outscore non-target-only vocabulary.
    assert out[1]["dsir_score"] > 0 > out[2]["dsir_score"]


# ------------------------------------------------------ count-min sketch
def test_cms_width_one_estimates_total(spark):
    """w=1 forces every key into one cell per row: the estimate for any
    key is the total event count — the degenerate upper bound."""
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2, "v STRING"
    )
    out = cms_topk_estimates(df, "v", k=3, d=4, w=1).collect()
    assert {r["value"]: r["exact_count"] for r in out} == {
        "a": 5, "b": 3, "c": 2
    }
    assert all(r["cms_estimate"] == 10 for r in out)
    assert [r["value"] for r in sorted(out, key=lambda r: r["rank"])] == [
        "a", "b", "c"
    ]


def test_cms_never_underestimates_and_usually_exact(spark):
    vals = [(f"tok{i % 37}",) for i in range(1000)]
    df = spark.createDataFrame(vals, "v STRING")
    out = cms_topk_estimates(df, "v", k=37, d=4, w=256).collect()
    assert len(out) == 37
    assert all(r["cms_estimate"] >= r["exact_count"] for r in out)
    # 37 keys in 256 buckets x 4 rows: the min-over-rows estimate is
    # exact unless a key collides in ALL rows (probability ~ (37/256)^4).
    exact = sum(r["overestimate"] == 0 for r in out)
    assert exact >= 35


def test_cms_cells_merge_by_addition(spark):
    """The sketch of a union equals the cell-wise sum of the parts —
    the property that makes CMS incremental across days/partitions."""
    d1 = spark.createDataFrame([("a",), ("b",), ("a",)], "v STRING")
    d2 = spark.createDataFrame([("a",), ("c",)], "v STRING")
    u = cms_cells(d1.unionAll(d2), "v", d=2, w=8)
    merged = (
        cms_cells(d1, "v", d=2, w=8)
        .unionAll(cms_cells(d2, "v", d=2, w=8))
        .groupBy("row", "col")
        .agg(F.sum("cell_count").alias("cell_count"))
    )
    assert {tuple(r) for r in u.collect()} == {
        tuple(r) for r in merged.collect()
    }


# ------------------------------------------------------- retention curve
def test_retention_curve_crafted(spark):
    rows = [
        (1, 0.05, 10),
        (2, 0.55, 20),
        (3, 0.55, 30),
        (4, 1.0, 40),    # clamps into the top bin (19), not bin 20
        (5, None, 99),   # NULL score excluded entirely
        (6, -0.3, 7),    # clamps into the BOTTOM bin (0), never negative
        (7, 1.7, 3),     # clamps into the top bin alongside 1.0
    ]
    df = spark.createDataFrame(rows, "id BIGINT, q DOUBLE, w BIGINT")
    out = {
        r["threshold_bp"]: r
        for r in retention_curve(df, "q", "w", bins=20).collect()
    }
    # 0.05 * 20 = 1.0000000000000002 in IEEE doubles -> bin 1 (500 bp),
    # deterministically on BOTH engines (the oracle does the same
    # double math) — the curve bins the representable double, not the
    # decimal literal.
    assert set(out) == {0, 500, 5500, 9500}
    assert all(t >= 0 for t in out), "negative thresholds must not exist"
    assert (out[0]["docs_retained"], out[0]["weight_retained"]) == (6, 110)
    assert (out[500]["docs_retained"], out[500]["weight_retained"]) == (5, 103)
    assert (out[5500]["docs_retained"], out[5500]["weight_retained"]) == (4, 93)
    assert (out[9500]["docs_retained"], out[9500]["weight_retained"]) == (2, 43)
    assert out[0]["docs_frac"] == 1.0 and out[0]["weight_frac"] == 1.0


# ------------------------------------------------------- bigram LM score
def test_bigram_lm_matches_python_reference(spark):
    docs = [
        (0, "a b a b"),
        (1, "a b c"),
        (2, "z"),       # <2 tokens: no bigrams, absent from output
        (3, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    out = {r["doc_id"]: r for r in bigram_lm_scores(df, alpha=0.5).collect()}
    assert set(out) == {0, 1}

    # Python reference.
    toks = {0: ["a", "b", "a", "b"], 1: ["a", "b", "c"]}
    pairs: dict[tuple[str, str], int] = {}
    uni: dict[str, int] = {"z": 1}
    for ts in toks.values():
        for t in ts:
            uni[t] = uni.get(t, 0) + 1
        for w1, w2 in zip(ts, ts[1:]):
            pairs[(w1, w2)] = pairs.get((w1, w2), 0) + 1
    V = len(uni)
    nll = {
        (w1, w2): Decimal(
            str(round(-math.log((c + 0.5) / (uni[w1] + 0.5 * V)), 6))
        )
        for (w1, w2), c in pairs.items()
    }
    for doc_id, ts in toks.items():
        doc_pairs: dict[tuple[str, str], int] = {}
        for w1, w2 in zip(ts, ts[1:]):
            doc_pairs[(w1, w2)] = doc_pairs.get((w1, w2), 0) + 1
        expect = sum(c * nll[p] for p, c in doc_pairs.items())
        assert out[doc_id]["n_bigrams"] == len(ts) - 1
        assert abs(out[doc_id]["total_nll"] - float(expect)) < 1e-9
    # The repeated-bigram doc is more "fluent" per bigram than the
    # one containing the rare (b, c) transition.
    assert (
        out[0]["total_nll"] / out[0]["n_bigrams"]
        < out[1]["total_nll"] / out[1]["n_bigrams"]
    )


# --------------------------------------------------------- streaming CMS
def test_cms_stream_matches_batch(spark, tmp_path):
    """Stream-accumulated CMS cells must equal the batch sketch over the
    union of micro-batches (merge-by-addition), and point estimates off
    the streamed sink must match the batch estimator."""
    from conftest import SF_DIR
    from clinical_trials_data_pipeline_analyis_spark.streaming.events import (
        streaming_events_source,
    )
    from clinical_trials_data_pipeline_analyis_spark.streaming.sketches import (
        cms_cells_stream,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    pdf = ev.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).toPandas()
    src = tmp_path / "cms_src"
    src.mkdir()
    for i, chunk in enumerate(
        [pdf.iloc[:300], pdf.iloc[300:700], pdf.iloc[700:]]
    ):
        chunk.to_json(src / f"b{i}.json", orient="records", lines=True)

    stream = streaming_events_source(spark, str(src))
    q = (
        cms_cells_stream(stream, "event_type", d=4, w=64)
        .writeStream.format("memory")
        .queryName("cms_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["row"], r["col"]): r["cell_count"]
        for r in spark.sql("SELECT * FROM cms_sink").collect()
    }
    want = {
        (r["row"], r["col"]): r["cell_count"]
        for r in cms_cells(ev, "event_type", d=4, w=64).collect()
    }
    assert got == want

    # point estimates off the streamed cells == batch estimator
    sink = spark.sql("SELECT * FROM cms_sink")
    batch_est = {
        r["value"]: r["cms_estimate"]
        for r in cms_topk_estimates(ev, "event_type", k=10, d=4, w=64).collect()
    }
    for value, want_est in batch_est.items():
        cells = {
            (r, _bucket(f"{r}:{value}", 64)) for r in range(4)
        }
        est = min(got[c] for c in cells)
        assert est == want_est


# ----------------------------------------------------- ADC exact rerank
def test_adc_rerank_orders_by_exact_cosine(spark):
    from clinical_trials_data_pipeline_analyis_spark.operators.pq import adc_rerank_topk

    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),          # query
            (1, [0.9, 0.1]),          # closest
            (2, [0.5, 0.5]),
            (3, [0.0, 1.0]),          # orthogonal
            (4, [-1.0, 0.0]),         # opposite
        ],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    # ADC shortlist deliberately mis-ordered (quantization error): the
    # refine pass must restore the exact-cosine order and cut to k.
    shortlist = spark.createDataFrame(
        [(0, 4, 1), (0, 3, 2), (0, 2, 3), (0, 1, 4)],
        "query_id BIGINT, candidate_id BIGINT, rank BIGINT",
    )
    queries = corpus.filter(F.col("vec_id") == 0)
    out = adc_rerank_topk(shortlist, queries, corpus, k=3).collect()
    got = [(r["candidate_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got == [(1, 1), (2, 2), (3, 3)]
    by_cand = {r["candidate_id"]: r["cosine"] for r in out}
    import math as _m
    assert abs(by_cand[1] - round(0.9 / _m.sqrt(0.81 + 0.01), 6)) < 1e-12
    assert by_cand[3] == 0.0


def test_adc_rerank_cost_is_shortlist_bounded(spark):
    """The refine plan must broadcast the shortlist and the query
    vectors — never shuffle or broadcast the corpus side."""
    from clinical_trials_data_pipeline_analyis_spark.operators.pq import adc_rerank_topk

    corpus = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id") < 3)
    shortlist = spark.createDataFrame(
        [(0, 5, 1), (1, 6, 1), (2, 7, 1)],
        "query_id BIGINT, candidate_id BIGINT, rank BIGINT",
    )
    plan = (
        adc_rerank_topk(shortlist, queries, corpus, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


# ------------------------------------------- temperature mixture rates
def test_temperature_mixture_crafted(spark):
    from clinical_trials_data_pipeline_analyis_spark.operators.sampling import (
        temperature_mixture_rates,
    )

    rows = [("en",)] * 100 + [("fr",)] * 10
    df = spark.createDataFrame(rows, "lang STRING")
    out = {
        r["lang"]: r
        for r in temperature_mixture_rates(df, "lang", alpha=0.5).collect()
    }
    import math as _m

    d = _m.sqrt(100) + _m.sqrt(10)
    w_en = round(_m.sqrt(100) / d, 6)
    w_fr = round(_m.sqrt(10) / d, 6)
    assert out["en"]["target_w"] == w_en
    assert out["fr"]["target_w"] == w_fr
    # fr is the binding stratum (smallest n/w): keeps everything;
    # en downsamples to w_en * N* / 100.
    nstar = min(100 / w_en, 10 / w_fr)
    assert out["fr"]["keep_rate"] == 1.0
    assert out["en"]["keep_rate"] == round(w_en * nstar / 100, 6)
    # alpha=1 reproduces the corpus up to the 6dp share rounding: the
    # binding stratum keeps exactly 1.0 and the other within one
    # rounding ulp of it (w is rounded before N*, so 100/0.909091 and
    # 10/0.090909 differ in the 7th digit).
    out1 = {
        r["lang"]: r["keep_rate"]
        for r in temperature_mixture_rates(df, "lang", alpha=1.0).collect()
    }
    assert max(out1.values()) == 1.0
    assert min(out1.values()) >= 0.999998


# ------------------------------------------------------ PageRank (a72)
def test_pagerank_matches_python_fixed_point(spark):
    from clinical_trials_data_pipeline_analyis_spark.operators.graph import (
        PAGERANK_SCALE,
        pagerank_fixed_point,
    )

    # star: 0 at the center of 1..4, plus an off-hub edge 5-6
    edge_list = [(0, 1), (0, 2), (0, 3), (0, 4), (5, 6)]
    edges = spark.createDataFrame(edge_list, "src BIGINT, dst BIGINT")
    out = {
        r["node"]: (r["degree"], r["rank_ppb"])
        for r in pagerank_fixed_point(edges, iterations=5).collect()
    }

    # independent reference with the SAME integer arithmetic
    sym: dict[int, set[int]] = {}
    for a, b in edge_list:
        sym.setdefault(a, set()).add(b)
        sym.setdefault(b, set()).add(a)
    n = len(sym)
    rank = {v: PAGERANK_SCALE // n for v in sym}
    base = (15 * PAGERANK_SCALE // 100) // n
    for _ in range(5):
        contrib = {v: rank[v] // len(sym[v]) for v in sym}
        rank = {
            v: base + 85 * sum(contrib[u] for u in sym[v]) // 100
            for v in sym
        }
    for v in sym:
        assert out[v] == (len(sym[v]), rank[v]), v
    # the hub out-ranks every leaf; leaves tie by symmetry
    assert out[0][1] > out[1][1]
    assert len({out[v][1] for v in (1, 2, 3, 4)}) == 1


# ------------------------------------------- Bloom decontamination (a73)
def test_bloom_decontaminate_no_false_negatives_and_fp_accounting(spark):
    from clinical_trials_data_pipeline_analyis_spark.operators.dedup import (
        bloom_decontaminate,
    )

    bench = spark.createDataFrame(
        [(1000, "alpha beta gamma delta")], "doc_id BIGINT, text STRING"
    )
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma epsilon"),   # shares shingle "alpha beta gamma"
            (2, "zeta eta theta iota"),        # no true overlap
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {
        r["doc_id"]: r
        for r in bloom_decontaminate(train, bench, k=3).collect()
    }
    # true overlap always caught, and bloom_hits >= exact_hits everywhere
    assert 1 in out and out[1]["exact_hits"] == 1
    assert all(r["bloom_hits"] >= r["exact_hits"] for r in out.values())
    assert all(r["false_positives"] >= 0 for r in out.values())

    # m_bits=1: every position collides -> every shingle "hits"; the
    # false-positive column must account for exactly the non-overlaps.
    out1 = {
        r["doc_id"]: r
        for r in bloom_decontaminate(train, bench, k=3, m_bits=1).collect()
    }
    for d, r in out1.items():
        assert r["bloom_hits"] == r["n_shingles"]
        assert r["false_positives"] == r["n_shingles"] - r["exact_hits"]


# ------------------------------------------------- ordered event funnel
def test_funnel_requires_strict_order(spark):
    import datetime as dt

    from clinical_trials_data_pipeline_analyis_spark.operators.events import (
        funnel_counts,
    )

    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        # user 1: full ordered funnel
        (1, "view", t0), (1, "click", t0 + h), (1, "purchase", t0 + 2 * h),
        # user 2: clicked BEFORE first view -> stuck at step 1
        (2, "click", t0), (2, "view", t0 + h),
        # user 3: view+click ordered, purchase SIMULTANEOUS with click
        # (strictly-after fails) -> step 2
        (3, "view", t0), (3, "click", t0 + h), (3, "purchase", t0 + h),
        # user 4: never viewed -> not in the funnel at all
        (4, "purchase", t0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id BIGINT, event_type STRING, ts TIMESTAMP_NTZ"
    )
    out = {
        r["step"]: r
        for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()
    }
    assert (out[1]["users"], out[2]["users"], out[3]["users"]) == (3, 2, 1)
    assert out[3]["conv_pct"] == round(1 / 3, 6)
    assert out[1]["step_name"] == "view"


# --------------------------------------------------- cohort retention
def test_cohort_retention_week_math(spark):
    import datetime as dt

    from clinical_trials_data_pipeline_analyis_spark.operators.events import (
        cohort_retention,
    )

    # 2024-01-01 is a Monday: epoch_day 19723, (19723-4) DIV 7 = 2817.
    base = dt.datetime(2024, 1, 1, 12, 0)
    d = dt.timedelta(days=1)
    rows = [
        (1, base),                 # cohort week W, active week 0
        (1, base + 7 * d),         # ... and week 1
        (2, base + 2 * d),         # same cohort week W (Wednesday)
        (3, base + 7 * d),         # next cohort week W+1
    ]
    ev = spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP_NTZ")
    out = {
        (r["cohort_week"], r["age_weeks"]): r
        for r in cohort_retention(ev).collect()
    }
    W = (19723 - 4) // 7
    assert set(out) == {(W, 0), (W, 1), (W + 1, 0)}
    assert out[(W, 0)]["active_users"] == 2
    assert out[(W, 0)]["cohort_size"] == 2
    assert out[(W, 1)]["active_users"] == 1
    assert out[(W, 1)]["retention_pct"] == 0.5
    assert out[(W + 1, 0)]["cohort_size"] == 1


def test_temperature_mixture_vanishing_stratum(spark):
    """A stratum whose 6dp-rounded share is 0.0 (1 doc among millions-
    scale skew) must not crash the N* scan; it keeps 0.0 while the rest
    stay sane. alpha=3 cubes the imbalance so w_fr rounds to zero."""
    from clinical_trials_data_pipeline_analyis_spark.operators.sampling import (
        temperature_mixture_rates,
    )

    rows = [("en",)] * 200 + [("fr",)]
    df = spark.createDataFrame(rows, "lang STRING")
    out = {
        r["lang"]: r
        for r in temperature_mixture_rates(df, "lang", alpha=3.0).collect()
    }
    assert out["fr"]["target_w"] == 0.0
    assert out["fr"]["keep_rate"] == 0.0
    assert out["en"]["keep_rate"] == 1.0


# ------------------------------------------- streaming cohort substrate
def test_cohort_activity_stream_matches_batch(spark, tmp_path):
    """Stream-accumulated (user, day) activity must equal the batch
    distinct-activity table over the union of micro-batches, and the
    cohort read-off over the streamed sink must equal the batch
    cohort_retention output."""
    from clinical_trials_data_pipeline_analyis_spark.operators.events import (
        cohort_retention,
    )
    from clinical_trials_data_pipeline_analyis_spark.streaming.events import (
        streaming_events_source,
        user_day_activity_stream,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    pdf = ev.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).toPandas()
    # to_json writes datetimes as epoch millis; the stream schema parses
    # timestamps from strings — serialize ISO so event time survives.
    pdf["ts"] = pdf["ts"].map(lambda t: t.isoformat())
    src = tmp_path / "cohort_src"
    src.mkdir()
    for i, chunk in enumerate(
        [pdf.iloc[:300], pdf.iloc[300:700], pdf.iloc[700:]]
    ):
        chunk.to_json(src / f"b{i}.json", orient="records", lines=True)

    stream = streaming_events_source(spark, str(src))
    q = (
        user_day_activity_stream(stream)
        .writeStream.format("memory")
        .queryName("cohort_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    sink = spark.sql("SELECT * FROM cohort_sink")
    got_days = {(r["user_id"], r["d"]) for r in sink.collect()}
    want_days = {
        (r["user_id"], r["d"])
        for r in ev.select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).cast("long").alias("d"),
        ).distinct().collect()
    }
    assert got_days == want_days

    # matrix read-off over the streamed sink == batch operator
    # (re-materialized: self-joining the memory-sink view trips Spark's
    # conflicting-reference resolution)
    sink = spark.createDataFrame(sink.collect(), sink.schema)
    first = sink.groupBy("user_id").agg(F.min("d").alias("_d0"))
    readoff = (
        sink.join(first, "user_id")
        .select(
            F.expr("(_d0 - 4) DIV 7").alias("cohort_week"),
            F.expr("(d - _d0) DIV 7").alias("age_weeks"),
            "user_id",
        )
        .distinct()
        .groupBy("cohort_week", "age_weeks")
        .agg(F.count(F.lit(1)).cast("long").alias("active_users"))
    )
    got = {
        (r["cohort_week"], r["age_weeks"]): r["active_users"]
        for r in readoff.collect()
    }
    want = {
        (r["cohort_week"], r["age_weeks"]): r["active_users"]
        for r in cohort_retention(ev).collect()
    }
    assert got == want


# ------------------------------------------------- corpus snapshot diff
def test_snapshot_diff_statuses(spark):
    from clinical_trials_data_pipeline_analyis_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will be removed"),
         (4, "Whitespace   Normalized"),
         (6, None),            # NULL text on BOTH sides: unchanged, no churn
         (7, None)],           # NULL -> text: changed
        "doc_id BIGINT, text STRING",
    )
    new = spark.createDataFrame(
        [(1, "same text"), (2, "changed!"), (5, "brand new"),
         # same content identity after normalization: NOT churn
         (4, "whitespace normalized"),
         (6, None),
         (7, "now has text"),
         (8, None)],           # absent -> NULL text: still ADDED
        "doc_id BIGINT, text STRING",
    )
    out = {r["doc_id"]: r for r in snapshot_diff(old, new).collect()}
    # doc 6 (NULL text both sides) must NOT appear — presence is decided
    # by join side, not fingerprint nullness
    assert set(out) == {2, 3, 5, 7, 8}
    assert out[2]["status"] == "changed"
    assert out[2]["old_fp"] is not None and out[2]["new_fp"] is not None
    assert out[3]["status"] == "removed" and out[3]["new_fp"] is None
    assert out[5]["status"] == "added" and out[5]["old_fp"] is None
    assert out[7]["status"] == "changed" and out[7]["old_fp"] is None
    assert out[8]["status"] == "added" and out[8]["new_fp"] is None


# ---------------------------------------------- rolling daily aggregates
def test_rolling_daily_range_frame_respects_gaps(spark):
    """A RANGE frame on day numbers must look back CALENDAR days, not
    rows: with activity on days 0, 1, and 10, day 10's trailing-7-day
    window contains only day 10."""
    import datetime as dt

    from clinical_trials_data_pipeline_analyis_spark.operators.events import (
        daily_rolling_counts,
    )

    base = dt.datetime(2024, 1, 1, 8, 0)
    d = dt.timedelta(days=1)
    rows = (
        [("click", base)] * 3
        + [("click", base + d)] * 2
        + [("click", base + 10 * d)] * 5
    )
    ev = spark.createDataFrame(rows, "event_type STRING, ts TIMESTAMP_NTZ")
    out = {
        r["d"]: r for r in daily_rolling_counts(ev, window_days=7).collect()
    }
    d0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    assert out[d0]["rolling_count"] == 3
    assert out[d0 + 1]["rolling_count"] == 5          # days 0+1
    assert out[d0 + 10]["rolling_count"] == 5          # gap: day 10 only
    assert out[d0 + 1]["rolling_avg"] == round(5 / 7, 6)


# --------------------------------------------------- duplicate capping
def test_cap_duplicates_keeps_n_lowest_ids(spark):
    from clinical_trials_data_pipeline_analyis_spark.operators.dedup import cap_duplicates

    docs = [
        (1, "same content"), (5, "same content"), (3, "same content"),
        (2, "unique"),
        (4, "Same   CONTENT"),  # normalizes to the same fingerprint
    ]
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    out = {r["doc_id"]: r for r in cap_duplicates(df, max_copies=2).collect()}
    # fingerprint group {1,3,4,5}: survivors are the 2 lowest ids
    assert set(out) == {1, 2, 3}
    assert out[1]["copy_rank"] == 1 and out[3]["copy_rank"] == 2
    assert out[1]["n_copies"] == 4  # original duplication preserved
    assert out[2]["n_copies"] == 1


# ------------------------------------------------ JSONL quarantine read
def test_jsonl_quarantine_split(spark, tmp_path):
    from clinical_trials_data_pipeline_analyis_spark.sources.jsonl import (
        read_jsonl_quarantined,
    )

    p = tmp_path / "drop"
    p.mkdir()
    lines = [
        '{"doc_id": 1, "text": "good line"}',
        '{"doc_id": 2, "text": "also good"}',
        '{"doc_id": 3, "text": "truncated',          # malformed JSON
        'not json at all',
        '{"doc_id": "not-a-number", "text": "type violation"}',
    ]
    (p / "part-0.jsonl").write_text("\n".join(lines) + "\n")

    good, quarantine = read_jsonl_quarantined(
        spark, str(p), "doc_id BIGINT, text STRING"
    )
    got = {r["doc_id"]: r["text"] for r in good.collect()}
    assert got == {1: "good line", 2: "also good"}
    raw = {r["_corrupt_record"] for r in quarantine.collect()}
    # every bad line preserved verbatim for forensics
    assert raw == {lines[2], lines[3], lines[4]}


def test_jsonl_quarantine_does_not_mutate_caller_schema(spark, tmp_path):
    """StructType.add mutates in place; the reader must build a FRESH
    schema, so the caller's object is unchanged and a second call with
    the same object doesn't produce a duplicate corrupt column."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from clinical_trials_data_pipeline_analyis_spark.sources.jsonl import (
        read_jsonl_quarantined,
    )

    p = tmp_path / "drop2"
    p.mkdir()
    (p / "part-0.jsonl").write_text(
        '{"doc_id": 1, "text": "ok"}\nbroken\n'
    )
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("text", StringType(), True),
        ]
    )
    good1, quar1 = read_jsonl_quarantined(spark, str(p), schema)
    good2, quar2 = read_jsonl_quarantined(spark, str(p), schema)
    assert [f.name for f in schema.fields] == ["doc_id", "text"]
    assert good1.columns == good2.columns == ["doc_id", "text"]
    assert quar2.columns.count("_corrupt_record") == 1
    # collect (all columns) rather than count(): a bare count() prunes
    # to only the corrupt column, which Spark's raw-scan rule forbids
    assert len(quar1.collect()) == len(quar2.collect()) == 1


# --------------------------------------------------- argmax aggregation
def test_argmax_latest_event_partial_aggregates(spark):
    """The max_by form must run as a TWO-PHASE aggregate (partial map
    side before the exchange) with no Window — the exchange then
    carries one argmax buffer per (partition, user) instead of every
    event row, which is the point of preferring it at scale. (Spark
    executes the struct-keyed max_by as SortAggregate; the sort is over
    pre-aggregated rows, not the event log.)"""
    from clinical_trials_data_pipeline_analyis_spark.suite import spark_queries

    df = spark_queries()["a82_latest_event_argmax"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_max_by" in plan


# ------------------------------------------- weighted sampling (A-Res)
def test_weighted_sample_matches_python_reference(spark):
    from clinical_trials_data_pipeline_analyis_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, (i % 7) + 1) for i in range(100)] + [(200, None), (201, 0)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, w BIGINT")
    out = [
        (r["doc_id"], r["rank"])
        for r in sorted(
            weighted_sample(df, "doc_id", "w", k=10).collect(),
            key=lambda r: r["rank"],
        )
    ]

    import math

    m = 2_147_483_648
    keyed = []
    for i, w in rows:
        if not w:
            continue  # NULL / zero weight excluded
        u = (_bucket(str(i), m) + 1.0) / (m + 1.0)
        keyed.append((round(math.log(u) / w, 12), -i))
    keyed.sort(reverse=True)
    expect = [(-neg_id, rank) for rank, (_, neg_id) in enumerate(keyed[:10], 1)]
    assert out == expect


def test_weighted_sample_weight_monotonicity(spark):
    """Across many disjoint id universes, heavier items must be sampled
    more often — the defining property of weighted sampling."""
    from clinical_trials_data_pipeline_analyis_spark.operators.sampling import (
        weighted_sample,
    )

    rows = []
    for trial in range(40):
        base = trial * 10
        rows += [(base, 10, trial), (base + 1, 1, trial)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, w BIGINT, trial BIGINT")
    heavy = light = 0
    for trial in range(40):
        sub = df.filter(F.col("trial") == trial)
        picked = weighted_sample(sub, "doc_id", "w", k=1).collect()[0]["doc_id"]
        if picked % 10 == 0:
            heavy += 1
        else:
            light += 1
    # P(heavy) = 10/11 per trial; 40 trials make heavy < light
    # astronomically unlikely.
    assert heavy > light
