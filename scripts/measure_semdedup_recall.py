"""Measured SemDeDup CELL recall — the round-12 completion of the
measured-recall story for the last LSH-ish family (RHP round 11,
MinHash/SimHash round 12).

SemDeDup's pair scan is confined to IVF cells: a duplicate pair whose
members assign to DIFFERENT cells is never compared, whatever the
threshold. That structural loss is the family's recall dimension, and
it is computable pairwise like the RHP harness: regenerate the exact
corpus (same seed/arithmetic as ``bench_ann_scale.gen_embeddings``),
take the generator's direct (src, dup) edges, assign both members to
their argmax-cosine centroid under the rungs' deterministic centroid
scheme (``vec_id % 97 == 0 AND vec_id < 97k``), and count same-cell
pairs.

The k-growth law (``semdedup_auto_k``, k ∝ n / 2000) holds cell SIZE
flat, so the pair-scan cost stays linear — this harness measures what
that costs in recall as k grows: more centroids mean more cell
boundaries for a dup pair to straddle.

Usage: python scripts/measure_semdedup_recall.py [--vecs 500000]
       [--ks 256 512 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clinical_trials_data_pipeline_analyis_spark.operators.similarity import (  # noqa: E402
    semdedup_auto_k,
)

DIM, N_CLUSTERS, SEED = 64, 24, 7


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vecs", type=int, default=500_000)
    ap.add_argument("--ks", type=int, nargs="*", default=None)
    args = ap.parse_args()

    # Exact bench_ann_scale.gen_embeddings arithmetic, edges recorded
    # (the measure_rhp_recall pattern).
    rng = np.random.default_rng(SEED)
    w = 1.0 / np.arange(1, N_CLUSTERS + 1)
    p = w / w.sum()
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    assign = rng.choice(N_CLUSTERS, size=args.vecs, p=p)
    vecs = 0.5 * centers[assign] + rng.normal(size=(args.vecs, DIM))
    dup_mask = rng.random(args.vecs) < 0.05
    pairs = []
    for i in np.nonzero(dup_mask)[0]:
        if i < 10:
            continue
        src = rng.integers(0, i)
        vecs[i] = vecs[src] + 0.15 * rng.normal(size=DIM)
        assign[i] = assign[src]
        pairs.append((src, i))
    vecs = vecs.astype("float32").astype("float64")
    pairs = np.array(pairs)

    a, b = vecs[pairs[:, 0]], vecs[pairs[:, 1]]
    cos = (a * b).sum(1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    )
    print(
        f"vecs={args.vecs} dup pairs={len(pairs)} "
        f"cosine mean={cos.mean():.4f} p5={np.percentile(cos, 5):.4f}"
    )

    k_auto = semdedup_auto_k(args.vecs)
    ks = args.ks or sorted({k_auto, k_auto * 2, k_auto * 4})
    norms = np.linalg.norm(vecs, axis=1)
    results = {}
    for k in ks:
        # The rungs' deterministic centroid scheme.
        cent_ids = np.arange(0, 97 * k, 97)
        cent = vecs[cent_ids]
        cnorm = np.linalg.norm(cent, axis=1)

        def cells_of(rows: np.ndarray) -> np.ndarray:
            """(n, 2): argmax cell and runner-up, per vector."""
            out = np.empty((len(rows), 2), dtype=np.int64)
            for lo in range(0, len(rows), 65_536):
                chunk = rows[lo : lo + 65_536]
                sims = (vecs[chunk] @ cent.T) / (
                    norms[chunk][:, None] * cnorm[None, :]
                )
                top2 = np.argpartition(sims, -2, axis=1)[:, -2:]
                first = (
                    np.take_along_axis(sims, top2, 1).argmax(1)
                )
                out[lo : lo + 65_536, 0] = np.take_along_axis(
                    top2, first[:, None], 1
                )[:, 0]
                out[lo : lo + 65_536, 1] = np.take_along_axis(
                    top2, (1 - first)[:, None], 1
                )[:, 0]
            return out

        ca = cells_of(pairs[:, 0])
        cb = cells_of(pairs[:, 1])
        rec = float((ca[:, 0] == cb[:, 0]).mean())
        # Multi-probe mitigation: pair is scannable if the top-2 cell
        # sets intersect (2x assign/scan cost).
        rec2 = float(
            (
                (ca[:, 0:1] == cb).any(1) | (ca[:, 1:2] == cb).any(1)
            ).mean()
        )
        marker = " (auto-k at this n)" if k == k_auto else ""
        results[f"k{k}"] = round(rec, 4)
        results[f"k{k}_top2"] = round(rec2, 4)
        print(
            f"k={k}: cell recall {rec:.4f}, top-2 probe {rec2:.4f}"
            f"{marker}"
        )

    print(
        json.dumps(
            {
                "metric": "semdedup_cell_recall",
                "vecs": args.vecs,
                "pairs": int(len(pairs)),
                "cosine_mean": round(float(cos.mean()), 4),
                "k_auto": k_auto,
                **results,
            }
        )
    )


if __name__ == "__main__":
    main()
