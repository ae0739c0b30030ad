"""Measured RHP recall on the generator's ground-truth dup pairs.

Pair recall in banded sign-bit LSH depends only on the pair's own band
signatures, so it is computable pairwise in numpy — no corpus join:
regenerate the exact embedding corpus (same seed/arithmetic as
``bench_ann_scale.gen_embeddings``), take the direct (src, dup) edges
the generator created, sign both members against
``rhp_plan_vectors``'s planes, and count pairs sharing >= 1 band.

Round-11 result at 5M (249,962 ground-truth pairs, mean cosine
0.9908): measured vs Charikar (1 − (1 − p^bits)^bands at the mean):

    14-bit x 4 bands (1M geometry): 0.9532 vs 0.9546
    17-bit x 4 (the n-only law at 5M): 0.9215 vs 0.9219
    19-bit x 4 (escalated, the completing leg): 0.8945 vs 0.8956

The Charikar bound is predictive to three decimals on this geometry —
the escalation's recall price is a measured 5.9 points from the 1M
geometry, not a guess.

Usage: python scripts/measure_rhp_recall.py [--vecs 5000000]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clinical_trials_data_pipeline_analyis_spark.operators.similarity import (  # noqa: E402
    rhp_plan_vectors,
    rhp_recall_estimate,
)

DIM, N_CLUSTERS, SEED = 64, 24, 7


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vecs", type=int, default=5_000_000)
    ap.add_argument(
        "--geometries",
        nargs="*",
        default=["56x4", "68x4", "76x4"],
        help="n_bits x bands entries",
    )
    args = ap.parse_args()

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
    vecs = vecs.astype("float32")
    pairs = np.array(pairs)

    a = vecs[pairs[:, 0]].astype("float64")
    b = vecs[pairs[:, 1]].astype("float64")
    cos = (a * b).sum(1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    )
    print(
        f"pairs={len(pairs)} cosine mean={cos.mean():.4f} "
        f"p5={np.percentile(cos, 5):.4f} min={cos.min():.4f}"
    )
    for g in args.geometries:
        n_bits, bands = (int(x) for x in g.split("x"))
        planes = np.array(rhp_plan_vectors(n_bits, DIM, 13))
        sa = (a @ planes.T) >= 0
        sb = (b @ planes.T) >= 0
        per_band = n_bits // bands
        collide = np.zeros(len(pairs), bool)
        for band in range(bands):
            sl = slice(band * per_band, (band + 1) * per_band)
            collide |= (sa[:, sl] == sb[:, sl]).all(1)
        rec = collide.mean()
        # Same closed form the operator's escalation now reports
        # (round 12): keep script and operator on one estimator.
        pred = rhp_recall_estimate(float(cos.mean()), per_band, bands)
        print(
            f"{n_bits} bits x {bands} bands ({per_band}-bit): "
            f"measured recall {rec:.4f} vs Charikar-at-mean-cos {pred:.4f}"
        )


if __name__ == "__main__":
    main()
