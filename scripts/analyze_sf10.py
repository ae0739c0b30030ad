"""Compare the corpus-family sf10 sweep against the sf1 run and emit
the BASELINE.md scaling table (VERDICT r6 ask #3).

Input growth is a uniform 10x for every corpus query at this rung
(documents 50k -> 500k, embeddings 50k -> 500k), so the normalized
ratio is simply (t10/t1)/10 after host calibration — <= ~1 means
linear-or-better.

Usage: python scripts/analyze_sf10.py [sf10.json] [sf1.json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GROWTH = 10.0


def main() -> None:
    sf10_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "bench_corpus_sf10.json")
    )
    sf1_path = (
        sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "bench_sf1.json")
    )
    sf10 = json.load(open(sf10_path))
    sf1 = json.load(open(sf1_path))
    q10, q1 = sf10["queries"], sf1["queries"]
    calib = (sf10.get("calib_sec") or 1.0) / (sf1.get("calib_sec") or 1.0)

    rows = []
    for name in sorted(q10):
        base = name.split("(", 1)[0]  # x08's routed form maps to x08's row
        if base not in q1:
            continue
        ratio = q10[name] / max(q1[base], 1e-9) / calib
        rows.append((name, q1[base], q10[name], ratio, ratio / GROWTH))

    rows.sort(key=lambda r: -r[4])
    print(f"calib ratio sf10/sf1 host: {calib:.3f}")
    print("| query | sf1 s | sf10 s | raw ratio | /input-growth |")
    print("|---|---|---|---|---|")
    for name, t1, t10, r, rn in rows:
        flag = " **superlinear**" if rn > 1.25 and t10 > 2.0 else ""
        print(f"| {name} | {t1:.2f} | {t10:.2f} | {r:.2f}x | {rn:.2f}{flag} |")

    for name, err in sorted(sf10.get("errors", {}).items()):
        print(f"| {name} | — | — | ERROR | {err[:80]} |")

    bad = [r for r in rows if r[4] > 1.25 and r[2] > 2.0]
    print(f"\nsuperlinear (normalized > 1.25 and sf10 > 2s): {len(bad)}")
    for name, t1, t10, r, rn in bad:
        print(f"  {name}: {t1:.2f}s -> {t10:.2f}s ({rn:.2f} per-input)")


if __name__ == "__main__":
    main()
