"""Emit the BASELINE.md relational/events-at-100x table.

Compares bench_sf10rel.json (the 15-query sweep over the
`gen_sf1.py --reps 100` data, adjudicated rows filed fresh-process
best-of-2) against the same-host sf0.1 reference sweep
(bench_sf01_ref.json). Growth is a uniform 100x (every table the 15
queries read is key-offset-replicated 100x).

Adjudicated rows carry their OWN calib (retimed_calib) — those rows are
adjusted by their per-row calib instead of the sweep's.

Usage: python scripts/analyze_sf10rel.py [sf10rel.json] [sf01.json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GROWTH = 100.0


def main() -> None:
    p10 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "bench_sf10rel.json")
    p01 = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "bench_sf01_ref.json")
    s10, s01 = json.load(open(p10)), json.load(open(p01))
    q10, q01 = s10["queries"], s01["queries"]
    ref_calib = s01.get("calib_sec") or 1.0
    sweep_calib = s10.get("calib_sec") or 1.0
    row_calib = s10.get("retimed_calib", {})

    rows = []
    for name in sorted(q10):
        if name not in q01:
            continue
        calib = (row_calib.get(name) or sweep_calib) / ref_calib
        ratio = q10[name] / max(q01[name], 1e-9) / calib
        rows.append((name, q01[name], q10[name], ratio, ratio / GROWTH))
    rows.sort(key=lambda r: -r[4])

    print(
        f"sweep calib ratio vs sf0.1 ref: {sweep_calib / ref_calib:.3f}; "
        f"adjudicated rows use their own calib"
    )
    print("| query | sf0.1 s | sf10 s | raw ratio @100x | /input-growth |")
    print("|---|---|---|---|---|")
    for name, t01, t10, r, rn in rows:
        flag = " **superlinear**" if rn > 1.25 and t10 > 2.0 else ""
        print(f"| `{name}` | {t01:.2f} | {t10:.2f} | {r:.1f}x | {rn:.2f}{flag} |")


if __name__ == "__main__":
    main()
