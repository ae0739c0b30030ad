"""Round-14 warm-solo retime sweep (VERDICT r13 asks #1-2).

Targets: the seven rows that escaped the r13 capped gate between 1.5x
and 1.9x of baseline (a26/a23 sit on round-13-refactored SimHash code;
a34/a41 extend the adjudicated PQ family; q09/a50/a54 likely host
noise) plus the a21/a45 WATCH rows (two rounds of warm-solo drift with
no plan change, owed a named cause).

Method (the standing measurement methodology): each sample is a FRESH
process via run_one.py (best-of-2 inside the JVM — the first heavy run
measures JIT/codegen warmup), with its own calib_sec; a sample whose
calib exceeds --max-calib (loaded host window) is DISCARDED and
retried, up to --retries attempts, after which the best-calib attempt
is kept with a "loaded" flag. Two accepted samples per name. One JVM
at a time, ever.

Usage: python scripts/retime_r14.py [--out retime_r14.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NAMES = [
    "a26_dedup_simhash_verified",
    "a23_dedup_simhash_pairs",
    "a34_pq_train_step",
    "a41_pq_residual_encode",
    "q09_window_dedup",
    "a50_cell_assign_rowlocal",
    "a54_dup_ngram_coverage",
    "a21_dedup_cc_clusters",
    "a45_semantic_dedup",
]


def one_attempt(name: str, sf_dir: str) -> dict | None:
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        out = tf.name
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "run_one.py"),
             name, "--sf-dir", sf_dir, "--out", out],
            capture_output=True, text=True, timeout=900,
        )
        if r.returncode != 0:
            print(f"  attempt FAILED rc={r.returncode}: {r.stderr[-300:]}",
                  flush=True)
            return None
        d = json.load(open(out))
        return {"sec": d["queries"][name], "calib": d["calib_sec"]}
    finally:
        os.unlink(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "retime_r14.json"))
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--max-calib", type=float, default=0.65)
    ap.add_argument("--retries", type=int, default=4)
    ap.add_argument("--samples", type=int, default=2)
    args = ap.parse_args()

    results: dict[str, dict] = {}
    for name in NAMES:
        samples, discarded = [], []
        attempts = 0
        while len(samples) < args.samples and attempts < args.retries + args.samples:
            attempts += 1
            a = one_attempt(name, args.sf_dir)
            if a is None:
                continue
            tag = "ok" if a["calib"] <= args.max_calib else "loaded"
            print(f"{name}: {a['sec']:.3f}s calib {a['calib']:.3f} [{tag}]",
                  flush=True)
            if tag == "ok":
                samples.append(a)
            else:
                discarded.append(a)
        if len(samples) < args.samples and discarded:
            # past retries: keep best-calib loaded attempts, flagged
            discarded.sort(key=lambda d: d["calib"])
            while len(samples) < args.samples and discarded:
                d = discarded.pop(0)
                d["loaded"] = True
                samples.append(d)
        results[name] = {"samples": samples}
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
