"""Crafted-input tests for BM25 retrieval and the BPE training loop.

The oracle-parity suite checks a63/a64 value-exactly against DuckDB on
the testdata corpus; these tests pin the semantics the oracle can't
express — the iterative merge loop against a pure-Python reference BPE,
greedy-overlap merge behavior, and BM25 edge cases (absent query terms,
zero-token documents, hand-computed scores).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from clinical_trials_data_pipeline_analyis_spark.operators.bpe import (
    adjacent_pair_counts,
    bpe_train,
    encode_with_merges,
    merge_pair_expr,
    word_frequency_dict,
)
from clinical_trials_data_pipeline_analyis_spark.operators.retrieval import bm25_topk


# ---------------------------------------------------------------------
# Pure-Python reference BPE (Sennrich et al. 2016, algorithm 1), with
# the same deterministic tie-break (count DESC, pair lexicographic ASC).
# ---------------------------------------------------------------------


def _ref_word_freqs(texts: list[str]) -> dict[str, int]:
    freqs: dict[str, int] = {}
    for t in texts:
        for w in " ".join(t.lower().split()).split(" "):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    return freqs


def _ref_pair_counts(symdict: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for syms, freq in symdict.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
    return counts


def _ref_merge(syms: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    out: list[str] = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return tuple(out)


def _ref_bpe_train(texts: list[str], n_merges: int):
    freqs = _ref_word_freqs(texts)
    symdict = {tuple(w): f for w, f in freqs.items()}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts = _ref_pair_counts(symdict)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < 2:
            break
        merges.append((left, right, cnt))
        symdict = {
            _ref_merge(syms, left, right): f for syms, f in symdict.items()
        }
    return merges, symdict


_CORPUS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest wide wide wide",
    "low new wide slow slower",
]


def test_bpe_train_matches_python_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], "doc_id LONG, text STRING"
    )
    ref_merges, ref_dict = _ref_bpe_train(_CORPUS, n_merges=8)
    merges, final = bpe_train(docs, n_merges=8)
    assert merges == ref_merges
    got = {
        tuple(r["symbols"]): r["freq"]
        for r in final.select("symbols", "freq").collect()
    }
    want = {syms: f for syms, f in ref_dict.items()}
    assert got == want


def test_merge_pair_greedy_overlap(spark):
    """'aaa' under merge (a,a) -> [aa, a]: left-to-right non-overlapping,
    and the merged tail does not cascade into a triple merge."""
    df = spark.createDataFrame([(["a", "a", "a"],)], "symbols ARRAY<STRING>")
    out = df.select(merge_pair_expr("symbols", "a", "a").alias("m")).first()["m"]
    assert out == ["aa", "a"]


def test_encode_with_merges_replays_training(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], "doc_id LONG, text STRING"
    )
    merges, _ = bpe_train(docs, n_merges=6)
    enc = encode_with_merges(docs, merges)
    # Every word's tokens must equal the Python replay of the merges.
    for row in enc.collect():
        syms: tuple[str, ...] = tuple(row["word"])
        for left, right, _ in merges:
            syms = _ref_merge(syms, left, right)
        assert tuple(row["tokens"]) == syms, row["word"]


def test_pair_counts_skip_single_char_words(spark):
    wf = spark.createDataFrame(
        [("a", 100), ("ab", 2)], "word STRING, freq LONG"
    ).select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)), i -> substr(word, i, 1))"
        ).alias("symbols"),
    )
    rows = adjacent_pair_counts(wf).collect()
    assert [(r["left_sym"], r["right_sym"], r["pair_count"]) for r in rows] == [
        ("a", "b", 2)
    ]


def test_word_frequency_dict_normalizes(spark):
    docs = spark.createDataFrame(
        [(0, "  Low\tLOW  low "), (1, "")], "doc_id LONG, text STRING"
    )
    rows = word_frequency_dict(docs).collect()
    assert [(r["word"], r["freq"]) for r in rows] == [("low", 3)]


# ---------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------


def _bm25_ref(tf, df, dl, n_docs, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_bm25_hand_computed_scores(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark shuffle"),
            (2, "spark join"),
            (3, "join join join merge"),
            (4, ""),  # zero-token doc: counts toward N, never retrieved
        ],
        "doc_id LONG, text STRING",
    )
    queries = spark.createDataFrame(
        [(0, "spark"), (0, "shuffle"), (1, "join"), (1, "nosuchterm")],
        "query_id LONG, term STRING",
    )
    out = {
        (r["query_id"], r["doc_id"]): r
        for r in bm25_topk(docs, queries, k=5).collect()
    }
    n, avgdl = 4.0, (3 + 2 + 4) / 4.0
    # q0: doc1 matches both terms, doc2 only 'spark'.
    want_d1 = round(_bm25_ref(2, 2, 3, n, avgdl), 6) + round(
        _bm25_ref(1, 1, 3, n, avgdl), 6
    )
    want_d2 = round(_bm25_ref(1, 2, 2, n, avgdl), 6)
    assert abs(out[(0, 1)]["score"] - want_d1) < 1e-9
    assert abs(out[(0, 2)]["score"] - want_d2) < 1e-9
    assert out[(0, 1)]["rank"] == 1 and out[(0, 2)]["rank"] == 2
    assert out[(0, 1)]["n_terms_matched"] == 2
    # q1: 'nosuchterm' contributes nothing; doc3 beats doc2.
    assert out[(1, 3)]["rank"] == 1 and out[(1, 2)]["rank"] == 2
    assert out[(1, 3)]["n_terms_matched"] == 1
    # Zero-token doc never appears; absent term creates no rows.
    assert (0, 4) not in out and (1, 4) not in out
    assert len(out) == 4


def test_bm25_topk_truncates(spark):
    docs = spark.createDataFrame(
        [(i, "common word") for i in range(10)], "doc_id LONG, text STRING"
    )
    queries = spark.createDataFrame([(0, "common")], "query_id LONG, term STRING")
    rows = bm25_topk(docs, queries, k=3).collect()
    assert len(rows) == 3
    # Equal scores tie-break on doc_id ascending.
    assert [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])] == [0, 1, 2]


# ---------------------------------------------------------------------
# RRF fusion
# ---------------------------------------------------------------------


def test_rrf_fuse_hand_computed(spark):
    from clinical_trials_data_pipeline_analyis_spark.operators.retrieval import rrf_fuse

    ranked = spark.createDataFrame(
        [
            # system A ranking for query 0: docs 1, 2, 3
            (0, 1, 1), (0, 2, 2), (0, 3, 3),
            # system B ranking for query 0: docs 2, 1, 4
            (0, 2, 1), (0, 1, 2), (0, 4, 3),
        ],
        "query_id LONG, doc_id LONG, rank LONG",
    )
    out = {r["doc_id"]: r for r in rrf_fuse(ranked, k0=60, k=10).collect()}
    # doc1: 1/61 + 1/62; doc2: 1/62 + 1/61 -> tie, doc1 wins on id.
    assert out[1]["rank"] == 1 and out[2]["rank"] == 2
    assert out[1]["n_systems"] == 2 and out[4]["n_systems"] == 1
    want = round(round(1 / 61, 6) + round(1 / 62, 6), 10)
    assert abs(out[1]["rrf_score"] - want) < 1e-9
    # docs 3 and 4 tie on 1/63: id ascending.
    assert out[3]["rank"] == 3 and out[4]["rank"] == 4


def test_rrf_fuse_truncates_to_k(spark):
    from clinical_trials_data_pipeline_analyis_spark.operators.retrieval import rrf_fuse

    ranked = spark.createDataFrame(
        [(0, d, d) for d in range(1, 8)], "query_id LONG, doc_id LONG, rank LONG"
    )
    rows = rrf_fuse(ranked, k0=60, k=3).collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 2, 3]
