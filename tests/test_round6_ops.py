"""Round-6 operator tests: HyperLogLog distinct sketch (a86), BPE
encode registration (a85), and their scale/merge/streaming properties."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from conftest import SF_DIR  # noqa: E402


# --------------------------------------------------------------- HLL
def test_hll_holds_where_linear_counting_saturates(spark):
    """The round-5 verdict's crafted regime: cardinality well past the
    sketch size. Linear counting's occupancy hits m (ln(0) -> NULL,
    documented saturation); the HLL register table keeps carrying
    information (max-rho ranks grow), so its estimate stays within a
    few standard errors of truth."""
    from clinical_trials_data_pipeline_analyis_spark.operators.sketches import (
        hll_distinct,
        linear_counting_distinct,
    )

    m = 256  # small sketch so 40k distinct values is ~156x past it
    n = 40_000
    vals = spark.range(n).select(
        F.lit("g").alias("grp"),
        F.concat(F.lit("value-"), F.col("id")).alias("v"),
    )

    lc = linear_counting_distinct(vals, "grp", "v", m=m).collect()[0]
    assert lc["d_buckets"] == m, "crafted regime must saturate LC"
    assert lc["est_distinct"] is None, "saturated LC yields NULL"

    hll = hll_distinct(vals, "grp", "v", m=m).collect()[0]
    assert hll["est_distinct"] is not None
    # standard error 1.04/sqrt(256) = 6.5%; allow 4 sigma
    assert hll["rel_err"] < 0.26, f"HLL off by {hll['rel_err']}"


def test_hll_registers_merge_by_max(spark):
    """Sketch mergeability — the property that makes it incremental:
    registers built over two disjoint halves, merged by MAX per
    register, must equal the registers built over the full corpus."""
    from clinical_trials_data_pipeline_analyis_spark.operators.sketches import (
        hll_registers,
    )

    full = spark.range(5_000).select(
        F.lit("g").alias("grp"),
        F.concat(F.lit("doc-"), F.col("id")).alias("v"),
    )
    a = full.filter(F.col("v") < "doc-3")  # lexicographic split
    b = full.filter(~(F.col("v") < "doc-3"))

    merged = (
        hll_registers(a, "grp", "v", m=128)
        .unionByName(hll_registers(b, "grp", "v", m=128))
        .groupBy("grp", "register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    want = {
        (r["grp"], r["register"]): r["max_rho"]
        for r in hll_registers(full, "grp", "v", m=128).collect()
    }
    got = {
        (r["grp"], r["register"]): r["max_rho"] for r in merged.collect()
    }
    assert got == want


def test_hll_registers_stream_matches_batch(spark, tmp_path):
    """Stream-accumulated HLL registers must equal the batch sketch over
    the union of micro-batches (merge-by-max; idempotent, so replays
    cannot even inflate it)."""
    from clinical_trials_data_pipeline_analyis_spark.operators.sketches import (
        hll_registers,
    )
    from clinical_trials_data_pipeline_analyis_spark.streaming.events import (
        streaming_events_source,
    )
    from clinical_trials_data_pipeline_analyis_spark.streaming.sketches import (
        hll_registers_stream,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    pdf = ev.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).toPandas()
    src = tmp_path / "hll_src"
    src.mkdir()
    for i, chunk in enumerate(
        [pdf.iloc[:300], pdf.iloc[300:700], pdf.iloc[700:]]
    ):
        chunk.to_json(src / f"b{i}.json", orient="records", lines=True)

    stream = streaming_events_source(spark, str(src))
    q = (
        hll_registers_stream(stream, "event_type", "user_id", m=64)
        .writeStream.format("memory")
        .queryName("hll_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["event_type"], r["register"]): r["max_rho"]
        for r in spark.sql("SELECT * FROM hll_sink").collect()
    }
    want = {
        (r["event_type"], r["register"]): r["max_rho"]
        for r in hll_registers(ev, "event_type", "user_id", m=64).collect()
    }
    assert got == want

    # estimate read-off from the STREAMED sink equals the batch
    # estimator over the same data — the whole point of storing
    # registers: merge/stream first, estimate later
    from clinical_trials_data_pipeline_analyis_spark.operators.sketches import (
        hll_distinct,
        hll_estimate_from_registers,
    )

    off = {
        r["event_type"]: r["est_distinct"]
        for r in hll_estimate_from_registers(
            spark.sql("SELECT * FROM hll_sink"), "event_type", m=64
        ).collect()
    }
    batch = {
        r["event_type"]: r["est_distinct"]
        for r in hll_distinct(ev, "event_type", "user_id", m=64).collect()
    }
    assert off == batch


def test_hll_rho_matches_python_reference(spark):
    """rho (leading-zero rank of md5 hex chars 9-16) against a direct
    Python computation, including the hex-digit CASE boundaries."""
    import hashlib

    from clinical_trials_data_pipeline_analyis_spark.operators.sketches import (
        _hll_rho,
    )

    vals = [f"k{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "v STRING")
    got = {
        r["v"]: r["rho"]
        for r in df.select("v", _hll_rho(F.col("v")).alias("rho")).collect()
    }
    for v in vals:
        word = int(hashlib.md5(v.encode()).hexdigest()[8:16], 16)
        want = 33 if word == 0 else 32 - word.bit_length() + 1
        assert got[v] == want, v


# --------------------------------------- fixed-size quantizer models
def test_pq_codebook_size_is_corpus_independent(spark):
    """The round-6 sf1 finding: mod-only seeding made the PQ codebook
    grow as n/61 with the corpus — quadratic encode cost and codes that
    stop fitting in a byte. The cap must hold the codebook at
    max_codes per subspace no matter how large the corpus, and the
    SELECTED seeds must be identical across corpus sizes (a fixed
    model, not a corpus-relative one)."""
    from clinical_trials_data_pipeline_analyis_spark.operators.pq import (
        seed_codebooks,
    )

    def emb(n):
        return spark.range(n).selectExpr(
            "id AS vec_id",
            "transform(sequence(1, 8), i -> cast(id % 7 + i as float))"
            " AS embedding",
        )

    small = seed_codebooks(emb(2_000), m=2, mod=61)
    big = seed_codebooks(emb(60_000), m=2, mod=61)
    per_sub = big.groupBy("subspace").count().collect()
    assert all(r["count"] <= 256 for r in per_sub)
    # codes are byte-addressable: at most 256 per subspace, and the
    # small corpus's seeds are a PREFIX of the big corpus's seeds
    small_ids = {r["code_id"] for r in small.select("code_id").collect()}
    big_ids = {r["code_id"] for r in big.select("code_id").collect()}
    assert small_ids <= big_ids
    assert max(big_ids) < 61 * 256


def test_ivf_seed_centroids_are_capped(spark):
    """Same contract for the IVF coarse quantizer seeds used by the
    registered queries: the centroid count must not scale with the
    corpus (capped at 128 = ids below 97*128)."""
    from pyspark.sql import functions as F

    cap_filter = (F.col("vec_id") % 97 == 0) & (F.col("vec_id") < 12416)
    big = spark.range(80_000).select(F.col("id").alias("vec_id"))
    n = big.filter(cap_filter).count()
    assert n == 128


# ------------------------------------------------- span removal (a87)
def test_remove_duplicate_spans_crafted(spark):
    """Two docs share a 6-token run (every 5-window inside it recurs),
    so both lose exactly that span; a unique doc passes through intact;
    a doc that IS entirely a duplicate of another collapses to empty."""
    from clinical_trials_data_pipeline_analyis_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    shared = "the quick brown fox jumps high"
    rows = [
        (1, f"alpha beta {shared} gamma delta epsilon"),
        (2, f"one two three {shared} four five six"),
        (3, "entirely unique text with no repeats at all here"),
        (4, "copy copy copy identical payload words here now"),
        (5, "copy copy copy identical payload words here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, "doc_id", "text", k=5).collect()}

    assert out[1]["clean_text"] == "alpha beta gamma delta epsilon"
    assert out[1]["tokens_removed"] == 6
    assert out[2]["clean_text"] == "one two three four five six"
    assert out[2]["tokens_removed"] == 6
    assert out[3]["tokens_removed"] == 0
    assert out[3]["clean_text"] == rows[2][1]
    # exact whole-doc duplicates: every window recurs -> all tokens cut
    assert out[4]["clean_text"] == "" and out[5]["clean_text"] == ""
    assert out[4]["tokens_removed"] == out[4]["n_tokens"] == 8


def test_remove_duplicate_spans_properties(spark):
    """Structural invariants on a generated corpus: clean tokens are a
    SUBSEQUENCE of the original tokens (removal never reorders or
    invents), counts reconcile, and a doc with no detected span is
    byte-identical to its normalized text."""
    import random

    from clinical_trials_data_pipeline_analyis_spark.operators.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    rng = random.Random(7)
    vocab = "aa bb cc dd ee ff gg hh ii jj kk ll".split()
    texts = []
    for i in range(60):
        toks = [rng.choice(vocab) for _ in range(rng.randint(3, 30))]
        if i % 4 == 0 and texts:  # splice a copied run into some docs
            donor = texts[rng.randrange(len(texts))].split()
            if len(donor) >= 7:
                start = rng.randrange(len(donor) - 6)
                toks[1:1] = donor[start : start + 7]
        texts.append(" ".join(toks))
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id BIGINT, text STRING"
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, "doc_id", "text", k=5).collect()}
    spanned = {r["doc_id"] for r in duplicate_spans(df, "doc_id", "text", k=5).collect()}

    def is_subsequence(small, big):
        it = iter(big)
        return all(tok in it for tok in small)

    for i, text in enumerate(texts):
        orig = text.split()
        r = out[i]
        clean = r["clean_text"].split() if r["clean_text"] else []
        assert r["n_tokens"] == len(orig)
        assert r["tokens_removed"] == len(orig) - len(clean)
        assert is_subsequence(clean, orig), i
        if i not in spanned:
            assert r["tokens_removed"] == 0
            assert r["clean_text"] == " ".join(orig)


# ------------------------------------------------- real image headers
def _tiny_png(w: int, h: int) -> bytes:
    """A fully valid 1-pixel-data PNG of declared size w x h (header
    metadata is what's under test; IDAT content is a valid zlib stream
    of one black row — enough for any strict reader to accept)."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + b"\x00" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _tiny_jpeg(w: int, h: int) -> bytes:
    """SOI + APP0(JFIF) + SOF0 header prefix — the marker walk under
    test (a real camera JPEG has the same prefix structure)."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00\x48\x00\x48\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0


def test_parse_image_header_formats():
    from clinical_trials_data_pipeline_analyis_spark.operators.multimodal import (
        parse_image_header,
    )

    assert parse_image_header(_tiny_png(640, 480)) == ("image/png", 640, 480)
    assert parse_image_header(_tiny_jpeg(123, 77)) == ("image/jpeg", 123, 77)
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little")
    assert parse_image_header(gif) == ("image/gif", 320, 200)
    # not an image -> no format (caller falls back)
    assert parse_image_header(b"just some text bytes") == (None, None, None)
    assert parse_image_header(None) == (None, None, None)
    # recognized container, truncated dims -> format with NULL dims
    assert parse_image_header(b"\x89PNG\r\n\x1a\n\x00\x00") == (
        "image/png",
        None,
        None,
    )
    # JPEG with no SOF (header-only garbage after SOI)
    assert parse_image_header(b"\xff\xd8\xff\xd9") == ("image/jpeg", None, None)


def test_parse_image_header_never_crashes_on_arbitrary_bytes():
    """Corpus payloads are untrusted: truncated shards, bit rot,
    mislabeled formats. The header parser must be total — any byte
    string yields a 3-tuple, never an exception (fuzzed, plus adversarial
    prefixes that stress each branch's bounds checks)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from clinical_trials_data_pipeline_analyis_spark.operators.multimodal import (
        parse_image_header,
    )

    adversarial = [
        b"\x89PNG\r\n\x1a\n",              # signature only
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 15,  # one byte short of dims
        b"\xff\xd8",                        # bare SOI
        b"\xff\xd8\xff",                    # marker byte cut off
        b"\xff\xd8\xff\xc0\x00",            # SOF length cut off
        b"\xff\xd8\xff\xc0\x00\x0b\x08\x00",  # SOF dims truncated
        b"\xff\xd8\xff\xd0\xff\xd0",        # standalone markers only
        b"\xff\xd8\xff\xe0\xff\xff",        # absurd segment length
        b"GIF89a",                          # GIF signature only
        b"GIF87a\x01",                      # GIF dims truncated
    ]
    for b in adversarial:
        out = parse_image_header(b)
        assert isinstance(out, tuple) and len(out) == 3

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=64))
    def fuzz(b):
        out = parse_image_header(b)
        assert isinstance(out, tuple) and len(out) == 3

    fuzz()


def test_decode_image_metadata_reads_real_headers(spark):
    """The mapInPandas decode path must return TRUE dimensions for real
    image payloads and the deterministic fake for text payloads —
    mixed in one batch, NULL payloads keeping NULL metadata."""
    from clinical_trials_data_pipeline_analyis_spark.operators.multimodal import (
        decode_image_metadata,
    )

    png = _tiny_png(800, 600)
    jpg = _tiny_jpeg(64, 48)
    text = b"plain text payload"
    df = spark.createDataFrame(
        [(1, png), (2, jpg), (3, text), (4, None)],
        "doc_id BIGINT, payload BINARY",
    )
    got = {r["doc_id"]: r for r in decode_image_metadata(df).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == (
        "image/png",
        800,
        600,
    )
    assert got[1]["n_bytes"] == len(png)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == (
        "image/jpeg",
        64,
        48,
    )
    # text payload: unchanged deterministic fake (x15/a27 oracles rely on it)
    n = len(text)
    assert (got[3]["format"], got[3]["width"], got[3]["height"]) == (
        "fake/raw",
        n % 640 + 1,
        n % 480 + 1,
    )
    assert (
        got[4]["n_bytes"] is None
        and got[4]["format"] is None
        and got[4]["width"] is None
    )


# ------------------------------------------------ perceptron (a88)
def test_batch_perceptron_learns_separable_data(spark):
    """On linearly separable data the perceptron must converge to a
    perfect separator (mistake-bound guarantee): positive docs use one
    vocabulary, negative docs another."""
    from pyspark.sql import functions as F

    from clinical_trials_data_pipeline_analyis_spark.operators.perceptron import (
        batch_perceptron,
        perceptron_scores,
        token_features,
    )

    pos_vocab = ["alpha", "beta", "gamma", "delta"]
    neg_vocab = ["one", "two", "three", "four"]
    rows = []
    for i in range(40):
        vocab = pos_vocab if i % 2 == 0 else neg_vocab
        rows.append(
            (i, "en" if i % 2 == 0 else "fr",
             " ".join(vocab[(i + j) % 4] for j in range(6)))
        )
    docs = spark.createDataFrame(rows, "doc_id BIGINT, lang STRING, text STRING")
    feats = token_features(docs, F.col("lang") == "en", buckets=32)
    w = batch_perceptron(feats, iters=4)
    scored = perceptron_scores(feats, w)
    acc = scored.filter(F.col("predicted") == F.col("y")).count() / 40.0
    assert acc == 1.0, f"separable data must classify perfectly, got {acc}"


def test_batch_perceptron_matches_python_replay(spark):
    """The trained integer weights equal a direct Python replay of the
    batch updates — the property that makes the oracle exact."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from clinical_trials_data_pipeline_analyis_spark.operators.perceptron import (
        batch_perceptron,
    )

    rows = []
    for d in range(12):
        y = 1 if d % 3 == 0 else -1
        for b in range(5):
            if (d + b) % 2 == 0:
                rows.append((d, y, b, (d % 4) + 1))
    feats = spark.createDataFrame(
        rows, "doc_id BIGINT, y BIGINT, bucket BIGINT, cnt BIGINT"
    )
    got = {
        r["bucket"]: r["weight"]
        for r in batch_perceptron(feats, iters=3).collect()
    }

    w = defaultdict(int)
    for _ in range(3):
        # score every doc under current w, then batch-update
        scores = defaultdict(int)
        ys = {}
        for d, y, b, c in rows:
            scores[d] += c * w[b]
            ys[d] = y
        delta = defaultdict(int)
        for d, y, b, c in rows:
            if ys[d] * scores[d] <= 0:
                delta[b] += y * c
        for b, v in delta.items():
            w[b] += v
    want = {b: v for b, v in w.items()}
    assert got == want


def test_perceptron_model_joins_broadcast(spark):
    """The CORPUS-side model join (features x weights, per scoring
    pass) must be a BROADCAST hash join — the model is a fixed
    <= buckets-row table, and shuffling the corpus against it would be
    the classic scale mistake. (The weight-MERGE join w ⟗ delta is
    model x model — at most ``buckets`` rows on either side — and FULL
    OUTER, which Spark cannot broadcast; its sort-merge plan is
    bounded by the model size, not the corpus, so it is allowed.)"""
    from clinical_trials_data_pipeline_analyis_spark.suite import spark_queries

    for name in (
        "a88_perceptron_langfilter",
        "a89_perceptron_scores",
        "a90_perceptron_wide",
    ):
        df = spark_queries()[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the scoring pass broadcasts the weight table. (Earlier
        # iterations' joins are invisible here: the per-iteration
        # localCheckpoint EXECUTES them at construction and truncates
        # the visible plan to everything after the last checkpoint.)
        n_bcast = plan.count("BroadcastHashJoin [bucket")
        assert n_bcast >= 1, f"{name}: no broadcast model join\n{plan}"
        # the only allowed SortMergeJoins are the FULL OUTER
        # model-merge joins — never an inner corpus join
        import re

        for seg in re.findall(r"SortMergeJoin \[[^\n]*", plan):
            assert "FullOuter" in seg, f"{name}: corpus-side SMJ: {seg}"


# --------------------------------------------------------------- BPE a85
def test_bpe_encode_query_matches_python_replay(spark):
    """The registered a85 query against a pure-Python replay of the
    literal merge list (greedy left-to-right, non-overlapping)."""
    from clinical_trials_data_pipeline_analyis_spark.suite import spark_queries
    from clinical_trials_data_pipeline_analyis_spark.suite.extensions import (
        _BPE_MERGES,
    )

    out = spark_queries()["a85_bpe_encode"](spark, SF_DIR).collect()
    assert out, "a85 must produce rows at sf0.001"

    def encode(word: str) -> list[str]:
        syms = list(word)
        for left, right, _ in _BPE_MERGES:
            acc: list[str] = []
            for s in syms:
                if acc and acc[-1] == left and s == right:
                    acc[-1] = left + right
                else:
                    acc.append(s)
            syms = acc
        return syms

    for r in out[:2000]:
        toks = encode(r["word"])
        assert r["token_str"] == " ".join(toks), r["word"]
        assert r["n_tokens"] == len(toks)
