"""ANN/PQ-family scale check: generate an embeddings table at 25x the
sf0.1 vector count with CLUSTERED (Zipf-skewed) structure and bench the
ANN/PQ queries on it next to sf0.1.

The point is validating the scale behavior the sf0.1 bench can't see:
the probed-candidate bound under real cell skew (the largest cluster
holds ~26% of the corpus, so the vec_id%97 seed centroids inherit
heavily non-uniform cells), LUT/codebook broadcast behavior at a bigger
corpus, and the SemDeDup cell-keyed (non-broadcast) path.

Usage: python scripts/bench_ann_scale.py [--vecs 50000]
Writes parquet to ./testdata_sf1/embeddings.parquet (kept out of git),
prints one JSON line per query and a final summary line with per-vector
ms at both scales.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64  # matches the driver embeddings fixture (and _PQ_SUB * _PQ_M)
SF01_DIR = "/root/testdata/sf0.1"

#: ANN/PQ family registered queries (all read only the embeddings table).
QUERIES = [
    "x09_ann_cosine_topk",
    "x16_ann_ivf_topk",
    "a31_ann_ivf_multiprobe",
    "a33_pq_adc_topk",
    "a38_ivfpq_topk",
    "a43_ivfpq_residual_topk",
    "a45_semantic_dedup",
    "a49_ann_recall_at_k",
]


def gen_embeddings(path: str, n_vecs: int, n_clusters: int = 24, seed: int = 7) -> None:
    """Matches the driver fixture's cosine geometry (near-orthogonal
    vectors: measured all-pairs cosine mean ~0.00, p99 ~0.30 at sf0.1)
    while adding what uniform synthetic data hides:

    - Zipf-ish cluster sizes (p_i ~ 1/(i+1); largest cluster ~26% of the
      corpus) via a WEAK shared component per cluster (same-cluster
      cosine ~0.2 — below a45's 0.40 edge threshold, so cluster
      membership skews the IVF cells without making whole cells
      degenerate duplicate cliques);
    - 5% explicit near-duplicates (copy + 0.15-sigma perturbation,
      cosine ~0.98) sampled from ALL earlier vectors, so dup-of-dup
      chains produce multi-vector components for the CC stage.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    w = 1.0 / np.arange(1, n_clusters + 1)
    p = w / w.sum()
    centers = rng.normal(size=(n_clusters, DIM))
    assign = rng.choice(n_clusters, size=n_vecs, p=p)
    vecs = 0.5 * centers[assign] + rng.normal(size=(n_vecs, DIM))
    dup_mask = rng.random(n_vecs) < 0.05
    for i in np.nonzero(dup_mask)[0]:
        if i < 10:
            continue
        src = rng.integers(0, i)
        vecs[i] = vecs[src] + 0.15 * rng.normal(size=DIM)
        assign[i] = assign[src]
    vecs = vecs.astype("float32")
    table = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(
                [v for v in vecs.tolist()], pa.list_(pa.float32())
            ),
            "label": pa.array((assign % 8).astype("int32"), pa.int32()),
        }
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(table, path)


def bench_dir(spark, queries, sf_dir: str, names: list[str]) -> dict[str, float]:
    # warm-up: session + parquet footers + Python-worker/Arrow path
    queries["x16_ann_ivf_topk"](spark, sf_dir).count()
    out: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        n = queries[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 4)
        print(json.dumps({"dir": sf_dir, "query": name, "sec": out[name], "rows": n}), flush=True)
    return out


def bench_staged_ivfpq(spark, sf_dir: str, work_dir: str) -> dict[str, float]:
    """Split the IVFADC cost into index BUILD vs SEARCH (VERDICT r04 ask
    #4): the registered a38/a43 queries build their index inline (so the
    oracle can check the whole computation), which makes their
    end-to-end timings build-dominated and hides the search-latency
    story. Here the build stage materializes the staged artifacts
    (assignments, codebooks, codes — raw and residual variants) to
    parquet ONCE, then the search stage is timed alone against the
    staged tables: the shape a production deployment actually runs
    (build amortized over the corpus lifetime, search on every query
    batch)."""
    import shutil

    from pyspark.sql import functions as F

    from clinical_trials_data_pipeline_analyis_spark.operators.pq import (
        ivfpq_topk,
        ivfpq_topk_residual,
        pq_encode,
        residual_vectors,
        seed_codebooks,
    )
    from clinical_trials_data_pipeline_analyis_spark.operators.similarity import (
        ivf_assign,
    )

    M = 4  # matches suite._PQ_M (64 dims -> 4 x 16-dim subspaces)
    idx = os.path.join(work_dir, "ivfpq_index")
    shutil.rmtree(idx, ignore_errors=True)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids = emb.filter(F.col("vec_id") % 97 == 0)

    # ---- BUILD: assignments + raw/residual codebooks and codes --------
    t0 = time.time()
    ivf_assign(emb, centroids).select("vec_id", "centroid_id").write.parquet(
        f"{idx}/assignments"
    )
    assignments = spark.read.parquet(f"{idx}/assignments")
    cb_raw = seed_codebooks(emb, m=M, mod=61)
    cb_raw.write.parquet(f"{idx}/codebooks_raw")
    pq_encode(emb, spark.read.parquet(f"{idx}/codebooks_raw"), m=M).select(
        "vec_id", "subspace", "code_id"
    ).write.parquet(f"{idx}/codes_raw")
    res = residual_vectors(emb, assignments, centroids)
    seed_codebooks(res, m=M, mod=61, vec_col="residual").write.parquet(
        f"{idx}/codebooks_res"
    )
    pq_encode(
        res, spark.read.parquet(f"{idx}/codebooks_res"), m=M, vec_col="residual"
    ).select("vec_id", "subspace", "code_id").write.parquet(f"{idx}/codes_res")
    build_sec = round(time.time() - t0, 4)

    # ---- SEARCH: staged artifacts only ------------------------------
    queries = emb.filter(F.col("vec_id") % 200 == 0)
    staged = {
        name: spark.read.parquet(f"{idx}/{name}")
        for name in (
            "assignments",
            "codebooks_raw",
            "codes_raw",
            "codebooks_res",
            "codes_res",
        )
    }
    t0 = time.time()
    n_raw = ivfpq_topk(
        queries,
        staged["codes_raw"],
        staged["assignments"],
        staged["codebooks_raw"],
        centroids,
        m=M,
        k=5,
        nprobe=2,
    ).count()
    search_raw_sec = round(time.time() - t0, 4)
    t0 = time.time()
    n_res = ivfpq_topk_residual(
        queries,
        staged["codes_res"],
        staged["assignments"],
        staged["codebooks_res"],
        centroids,
        m=M,
        k=5,
        nprobe=2,
    ).count()
    search_res_sec = round(time.time() - t0, 4)
    # refine stage (a70's shape): widened shortlist -> exact-cosine
    # rerank against the full-precision vectors; cost must track
    # |queries| x shortlist, not corpus size.
    from clinical_trials_data_pipeline_analyis_spark.operators.pq import (
        adc_rerank_topk,
    )

    t0 = time.time()
    shortlist = ivfpq_topk(
        queries,
        staged["codes_raw"],
        staged["assignments"],
        staged["codebooks_raw"],
        centroids,
        m=M,
        k=10,
        nprobe=2,
    )
    n_rr = adc_rerank_topk(shortlist, queries, emb, k=5).count()
    search_rerank_sec = round(time.time() - t0, 4)
    out = {
        "build_sec": build_sec,
        "search_raw_sec": search_raw_sec,
        "search_res_sec": search_res_sec,
        "search_rerank_sec": search_rerank_sec,
        "rows_rerank": n_rr,
    }
    print(
        json.dumps(
            {"dir": sf_dir, "staged_ivfpq": out, "rows_raw": n_raw, "rows_res": n_res}
        ),
        flush=True,
    )
    shutil.rmtree(idx, ignore_errors=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vecs", type=int, default=50_000)
    ap.add_argument(
        "--dir",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "testdata_sf1",
        ),
    )
    args = ap.parse_args()

    pq_path = os.path.join(args.dir, "embeddings.parquet")
    if not os.path.exists(pq_path):
        t0 = time.time()
        gen_embeddings(pq_path, args.vecs)
        print(
            f"generated {args.vecs} embeddings in {time.time()-t0:.1f}s",
            file=sys.stderr,
        )

    from pyspark.sql import functions as F

    from clinical_trials_data_pipeline_analyis_spark.operators.similarity import (
        semantic_dedup,
    )
    from clinical_trials_data_pipeline_analyis_spark.session import get_spark
    from clinical_trials_data_pipeline_analyis_spark.suite import spark_queries

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(app_name="ann-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = spark_queries()

    big = bench_dir(spark, queries, args.dir, QUERIES)
    small = bench_dir(spark, queries, SF01_DIR, QUERIES)

    # staged build/search split (a38/a43 are build-dominated end-to-end;
    # this is the search-latency story on its own)
    staged_big = bench_staged_ivfpq(spark, args.dir, args.dir)
    staged_small = bench_staged_ivfpq(spark, SF01_DIR, args.dir)

    # SemDeDup cell-keyed (non-broadcast) scale path at 25x, explicitly:
    emb = spark.read.parquet(pq_path)
    cent = emb.filter(F.col("vec_id") % 97 == 0)
    t0 = time.time()
    n = semantic_dedup(emb, cent, 0.95, broadcast_limit=0).count()
    cell_keyed = round(time.time() - t0, 4)
    print(
        json.dumps(
            {"dir": args.dir, "query": "a45_cell_keyed_path", "sec": cell_keyed, "rows": n}
        ),
        flush=True,
    )

    n_small = spark.read.parquet(f"{SF01_DIR}/embeddings.parquet").count()
    summary = {
        "metric": "ann_scale",
        "n_vecs": args.vecs,
        "per_vec_ms_big": {q: round(big[q] / args.vecs * 1000, 4) for q in QUERIES},
        "per_vec_ms_sf01": {
            q: round(small[q] / n_small * 1000, 4) for q in QUERIES
        },
        "ratio_big_over_sf01": {
            q: round((big[q] / args.vecs) / (small[q] / n_small), 3)
            for q in QUERIES
        },
        "a45_cell_keyed_sec": cell_keyed,
        "staged_ivfpq_big": staged_big,
        "staged_ivfpq_sf01": staged_small,
        "staged_search_growth": {
            variant: round(staged_big[variant] / staged_small[variant], 3)
            for variant in ("search_raw_sec", "search_res_sec")
        },
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
