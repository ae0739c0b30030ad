"""Dedup-family scale check: generate an sf1-shaped documents table
(10x the sf0.1 row count, same vocabulary/length/duplication shape as
the driver testdata) and bench the dedup queries on it.

The point is validating the SCALE behavior the sf0.1 bench can't see:
post-explode partition sizing (`_spread`), LSH bucket growth, AQE skew
handling, and CC round counts on a 10x pair graph.

Usage: python scripts/bench_dedup_scale.py [--docs 50000]
Writes parquet to ./testdata_sf1/documents.parquet (kept out of git),
prints one JSON line per query.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = (
    "spark line column order small sort fast value scan batch part query "
    "agg table hash big merge group filter stream join vector key slow "
    "customer the a data plan node shuffle broadcast skew cache"
).split()

LANGS = ["en", "en", "en", "fr", "de", "zh"]


def gen_texts(
    n_docs: int, seed: int = 42, rng: random.Random | None = None
) -> tuple[list[str], list[tuple[int, int, str]]]:
    """The corpus text stream with its GROUND-TRUTH dup edges.

    Identical draw sequence to the original inline loop (the parquet
    fixtures regenerate bit-for-bit — pass the caller's ``rng`` to
    continue its stream, as ``gen_documents`` does for the metadata
    columns); additionally records every planted (src, i, kind) edge —
    kind 'exact' for the copy branch, 'near' for the copy+perturb
    branch — so recall harnesses (scripts/measure_text_recall.py, the
    RHP harness's pattern) measure candidate recall against what the
    generator actually planted instead of re-deriving it."""
    if rng is None:
        rng = random.Random(seed)
    texts: list[str] = []
    edges: list[tuple[int, int, str]] = []
    for i in range(n_docs):
        r = rng.random()
        if r < 0.04 and i > 10:
            # exact duplicate of an earlier doc
            src = rng.randrange(len(texts))
            texts.append(texts[src])
            edges.append((src, i, "exact"))
        elif r < 0.10 and i > 10:
            # near-duplicate: copy + perturb a few tokens
            src = rng.randrange(len(texts))
            toks = texts[src].split()
            for _ in range(max(1, len(toks) // 30)):
                toks[rng.randrange(len(toks))] = rng.choice(VOCAB)
            texts.append(" ".join(toks))
            edges.append((src, i, "near"))
        else:
            n_tok = rng.randint(15, 90)
            texts.append(" ".join(rng.choice(VOCAB) for _ in range(n_tok)))
    return texts, edges


def gen_documents(path: str, n_docs: int, seed: int = 42) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    texts, _ = gen_texts(n_docs, seed, rng=rng)
    table = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                [LANGS[rng.randrange(len(LANGS))] for _ in range(n_docs)],
                pa.string(),
            ),
            "source": pa.array(
                [f"src{i % 40}" for i in range(n_docs)], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(table, path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument(
        "--dir",
        default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1"),
    )
    args = ap.parse_args()

    pq_path = os.path.join(args.dir, "documents.parquet")
    if not os.path.exists(pq_path):
        t0 = time.time()
        gen_documents(pq_path, args.docs)
        print(f"generated {args.docs} docs in {time.time()-t0:.1f}s", file=sys.stderr)

    from clinical_trials_data_pipeline_analyis_spark.session import get_spark
    from clinical_trials_data_pipeline_analyis_spark.suite import spark_queries

    spark = get_spark(app_name="dedup-scale-bench")
    queries = spark_queries()
    names = [
        "x01_dedup_exact",
        "x05_dedup_minhash_lsh",
        "x17_dedup_minhash_estimate",
        "a21_dedup_cc_clusters",
        "a25_dedup_ngram_filtered",
        "a35_decontaminate",
        "a39_text_repetition",
        "a40_curation_funnel",
        # round-5 text/dedup additions (documents-only inputs)
        "a54_dup_ngram_coverage",
        "a56_vocab_oov_rates",
        "a59_dup_spans",
        "a60_leakage_safe_split",
        "a61_source_reputation",
        # retrieval / tokenizer-training additions (documents-only
        # inputs; a65 RRF needs embeddings so it stays in the sf bench)
        "a63_bm25_topk",
        "a64_bpe_pair_counts",
        # data-selection / sketch additions (documents-only inputs)
        "a66_dsir_importance",
        "a67_cms_heavy_hitters",
        "a68_retention_curve",
        "a69_bigram_lm_scores",
        # graph-composition additions (documents-only inputs); the
        # 50k fixture's preferential-attachment duplication makes the
        # pair graph ~50x denser than sf0.1 — the worst case for the
        # CC + PageRank composition
        "a73_bloom_decontaminate",
        "a76_canonical_by_centrality",
    ]
    # warm-up (session + parquet footer caches)
    queries["x01_dedup_exact"](spark, args.dir).count()
    out: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in names:
        t0 = time.time()
        rows[name] = queries[name](spark, args.dir).count()
        out[name] = round(time.time() - t0, 4)
    print(
        json.dumps(
            {
                "metric": "dedup_scale_wall_clock",
                "value": round(sum(out.values()), 4),
                "unit": "sec",
                "queries": out,
                "rows": rows,
                "n_docs": args.docs,
            }
        )
    )


if __name__ == "__main__":
    main()
