"""Adjudicate suspicious sweep rows in fresh single-query processes.

The round-11 sf10 re-measure found the same disease bench.py's
adjudication pass treats at sf0.1, at sweep scale: a 77-query sweep in
one long-lived JVM inflates late CPU-bound rows (a70 measured 249.5s
in-sweep vs 108.1s in a fresh process, identical code). This script
automates the fresh-process recipe used there:

1. pick suspects — names given explicitly, or every row whose
   calib-adjusted time exceeds ``--ratio`` x the same row in a prior
   sweep JSON (``--prior``);
2. re-run each suspect via ``bench_corpus_sf10.py --names <n>`` in its
   OWN process (own JVM, own calib — host drift is measured per row,
   not assumed);
3. merge: the fresh-process value is FILED into the sweep JSON's
   ``queries`` map (the round-11 bench rule: the retimed measurement
   itself, up or down, not min), with full disclosure fields —
   ``insweep`` (original values), ``retimed`` (fresh values),
   ``retimed_calib`` (per-row host calib) — and ``value`` re-summed.

Usage:
    python scripts/adjudicate_sweep.py SWEEP.json --names a70_... x05_...
    python scripts/adjudicate_sweep.py SWEEP.json --prior OLD.json --ratio 1.5
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def suspects_from_prior(sweep: dict, prior: dict, ratio: float) -> list[str]:
    cs, cp = sweep.get("calib_sec") or 1.0, prior.get("calib_sec") or 1.0
    out = []
    for name, t in sweep["queries"].items():
        pt = prior["queries"].get(name)
        if pt and (t / cs) / (pt / cp) >= ratio:
            out.append(name)
    return sorted(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sweep", help="sweep JSON to adjudicate (updated in place)")
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--prior", default=None, help="prior sweep JSON to compare")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--dir", default=None, help="corpus dir (forwarded)")
    ap.add_argument(
        "--max-calib",
        type=float,
        default=0.65,
        help="accept a fresh-process attempt only if its own calib_sec is "
        "at or under this (a quiet-host window); past --retries attempts "
        "the best-calib attempt is filed anyway",
    )
    ap.add_argument("--retries", type=int, default=4)
    ap.add_argument(
        "--runner",
        choices=("corpus", "suite"),
        default="corpus",
        help="corpus = bench_corpus_sf10.py --names (corpus-family rows, "
        "sf10 corpus shape, single timed run); suite = run_one.py --sf-dir "
        "(ANY registered query at any sf dir, BEST-OF-2 in the fresh JVM — "
        "the warm-solo method bench.py's in-suite adjudicator uses; a cold "
        "first run measures JIT/codegen warmup, see run_one.py)",
    )
    args = ap.parse_args()

    sweep = json.load(open(args.sweep))
    names = list(args.names or [])
    if args.prior:
        names += [
            n
            for n in suspects_from_prior(sweep, json.load(open(args.prior)), args.ratio)
            if n not in names
        ]
    if not names:
        print("no suspects — nothing to adjudicate")
        return

    bench = os.path.join(
        REPO,
        "scripts",
        "bench_corpus_sf10.py" if args.runner == "corpus" else "run_one.py",
    )
    insweep = dict(sweep.setdefault("insweep", {}))
    retimed = sweep.setdefault("retimed", {})
    recalib = sweep.setdefault("retimed_calib", {})
    for name in names:
        base = name.split("(")[0]  # routed forms re-run their base query
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            out = tf.name
        if args.runner == "corpus":
            cmd = [sys.executable, bench, "--names", base, "--out", out]
            if args.dir:
                cmd += ["--dir", args.dir]
        else:
            cmd = [sys.executable, bench, base, "--out", out]
            if args.dir:
                cmd += ["--sf-dir", args.dir]
        print(f"adjudicating {name} (fresh process)...", flush=True)
        # Load-aware retry: on a shared host the external load swings
        # minute-to-minute (measured calib 0.16-4.26 within two minutes
        # on the round-11 relational rung); a retime taken in a bad
        # window files a load artifact, not the query. Each attempt's
        # own calib is the witness — retry until it lands under
        # --max-calib, else keep the attempt with the best calib.
        fresh = None
        for attempt in range(args.retries):
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=7200
            )
            if proc.returncode != 0:
                print(f"  FAILED rc={proc.returncode}: {proc.stderr[-500:]}")
                continue
            cand = json.load(open(out))
            if name not in cand["queries"]:
                print(
                    f"  no timing for {name} in fresh run: {cand.get('errors')}"
                )
                continue
            if fresh is None or cand["calib_sec"] < fresh["calib_sec"]:
                fresh = cand
            if cand["calib_sec"] <= args.max_calib:
                break
            print(
                f"  attempt {attempt + 1}: calib {cand['calib_sec']} > "
                f"--max-calib {args.max_calib} (loaded host window), "
                f"retrying...",
                flush=True,
            )
        if os.path.exists(out):
            os.unlink(out)
        if fresh is None:
            continue
        insweep.setdefault(name, sweep["queries"][name])
        retimed[name] = fresh["queries"][name]
        recalib[name] = fresh["calib_sec"]
        sweep["queries"][name] = retimed[name]
        print(
            f"  insweep {insweep[name]:.1f}s -> filed {retimed[name]:.1f}s "
            f"(calib {recalib[name]})"
        )
    sweep["insweep"] = insweep
    sweep["value"] = round(sum(sweep["queries"].values()), 4)
    sweep["adjudication"] = (
        "rows re-run in fresh single-query processes (own JVM, own calib, "
        "recorded in retimed_calib); the fresh value is filed per the "
        "round-11 bench rule; in-sweep values kept under 'insweep'."
    )
    json.dump(sweep, open(args.sweep, "w"), indent=1, sort_keys=True)
    print(f"updated {args.sweep}: {len(retimed)} adjudicated rows")


if __name__ == "__main__":
    main()
