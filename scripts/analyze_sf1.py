"""Compare the whole-suite sf1 run against the sf0.1 reference run and
emit the BASELINE.md scaling table (VERDICT r05 ask #1).

Row-count scale differs per input family (TPC-H/events tables are 10x
replicas; documents is 10x from its own generator; embeddings is 25x),
so the table reports per-query wall seconds at both SFs, the raw ratio,
and the ratio NORMALIZED by that query's input growth — the number that
should be <= ~1 for linear-or-better operators. Queries whose output is
top-k/constant still pay input-linear scan costs, so the normalized
ratio is the honest metric for all of them.

Usage: python scripts/analyze_sf1.py [sf1.json] [sf01.json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: input-growth factor per query prefix family. documents-family = 10,
#: embeddings-family = 25 (50k vs 2k rows), tpch/events = 10.
EMB25 = {
    "x08", "x09", "x10", "x16", "x20", "a24", "a29", "a31", "a32", "a33",
    "a34", "a38", "a41", "a43", "a45", "a49", "a50", "a53", "a57", "a70",
}
#: a65 joins documents (10x) with embeddings (25x); call it 25 (worst side)
EMB25 |= {"a65"}


def growth(name: str) -> float:
    return 25.0 if name.split("_", 1)[0] in EMB25 else 10.0


def main() -> None:
    sf1_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "bench_sf1.json")
    sf01_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "bench_full.json")
    sf1 = json.load(open(sf1_path))
    sf01 = json.load(open(sf01_path))
    q1, q0 = sf1["queries"], sf01["queries"]
    calib = (sf1.get("calib_sec") or 1.0) / (sf01.get("calib_sec") or 1.0)

    rows = []
    for name in sorted(q1):
        if name not in q0:
            continue
        g = growth(name)
        ratio = q1[name] / max(q0[name], 1e-9) / calib
        rows.append((name, q0[name], q1[name], ratio, ratio / g))

    rows.sort(key=lambda r: -r[4])
    print(f"calib ratio sf1/sf0.1 host: {calib:.3f}")
    print("| query | sf0.1 s | sf1 s | raw ratio | /input-growth |")
    print("|---|---|---|---|---|")
    for name, t0, t1, r, rn in rows:
        flag = " **superlinear**" if rn > 1.25 and t1 > 1.0 else ""
        print(f"| {name} | {t0:.2f} | {t1:.2f} | {r:.2f}x | {rn:.2f}{flag} |")

    bad = [r for r in rows if r[4] > 1.25 and r[2] > 1.0]
    print(f"\nsuperlinear (normalized > 1.25 and sf1 > 1s): {len(bad)}")
    for name, t0, t1, r, rn in bad:
        print(f"  {name}: {t0:.2f}s -> {t1:.2f}s ({rn:.2f} per-input)")


if __name__ == "__main__":
    main()
