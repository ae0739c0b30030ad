"""Regenerate the BASELINE.md 'Corpus family at sf10 (100x)' table from
bench_corpus_sf10.json (the sweep) + bench_full.json (the same-host sf0.1
reference run).

Normalization: wall seconds are first divided by each run's host
calibration (calib_sec, the same fixed Spark workload timed in both
sessions), then by the ACTUAL input growth of the tables the query
reads — documents grew 100x (5k -> 500k) and embeddings 250x
(2k -> 500k); a query reading both is normalized by the larger (the
dominant input). A per-input-growth value of 1.0 means cost grew exactly
linearly with its input; values well above ~1 flag a super-linear term.

Usage: python scripts/analyze_sf10_corpus.py [--markdown]
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOC_GROWTH = 100.0  # 5k -> 500k documents
VEC_GROWTH = 250.0  # 2k -> 500k embeddings


def growth_for(name: str) -> float:
    from clinical_trials_data_pipeline_analyis_spark.suite import registry

    reg = registry()[name.split("(")[0]]
    sql = reg.oracle or ""
    uses_vec = bool(re.search(r"\bembeddings\b", sql))
    uses_doc = bool(re.search(r"\bdocuments\b", sql))
    if uses_vec:
        return VEC_GROWTH  # dominant when both are read
    if uses_doc:
        return DOC_GROWTH
    raise ValueError(f"{name}: oracle references neither corpus table")


def main() -> None:
    with open(os.path.join(REPO, "bench_corpus_sf10.json")) as f:
        sweep = json.load(f)
    with open(os.path.join(REPO, "bench_full.json")) as f:
        full = json.load(f)

    c10 = sweep["calib_sec"]
    c01 = full["calib_sec"]
    rows = []
    for name, t10 in sorted(sweep["queries"].items()):
        base = name.split("(")[0]
        t01 = full["queries"].get(base)
        if t01 is None:
            # Stale-prone fallback: a90 landed after the last full sf0.1
            # sweep, so its sf0.1 time is a hand-carried BASELINE row.
            # Warn LOUDLY whenever it is used — if bench_full.json has
            # been regenerated and still lacks the query, the right fix
            # is re-running the sf0.1 sweep, not trusting this constant.
            t01 = {"a90_perceptron_wide": 3.40}.get(base)
            if t01 is not None:
                print(
                    f"WARNING: {base} missing from bench_full.json; using "
                    f"hard-coded sf0.1 fallback {t01}s (re-run the sf0.1 "
                    "sweep to refresh)",
                    file=sys.stderr,
                )
            else:
                print(
                    f"WARNING: {base} missing from bench_full.json and has "
                    "no fallback; skipping (table is INCOMPLETE — re-run "
                    "the sf0.1 sweep)",
                    file=sys.stderr,
                )
        if not t01:
            continue
        g = growth_for(name)
        per_input = (t10 / c10) / (t01 / c01) / g
        rows.append((name, t01, t10, g, per_input))

    rows.sort(key=lambda r: -r[4])
    md = "--markdown" in sys.argv
    if md:
        print("| query | sf0.1 s | sf10 s | input growth | /input-growth |")
        print("|---|---|---|---|---|")
    for name, t01, t10, g, p in rows:
        if md:
            print(
                f"| `{name}` | {t01:.2f} | {t10:.1f} | {g:.0f}x | {p:.2f} |"
            )
        else:
            print(f"{name:45s} {t01:8.2f} {t10:9.1f} {g:6.0f}x {p:8.2f}")
    errs = sweep.get("errors", {})
    for name, e in sorted(errs.items()):
        print(f"ERROR {name}: {e[:120]}")


if __name__ == "__main__":
    main()
