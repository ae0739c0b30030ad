"""Regenerate suite/window_history.py from the driver's CORRECTNESS_r*.json.

Run at ROUND START (after the previous round's CORRECTNESS artifact
lands) so the auto-rotated DRIVER_WINDOW sees the freshest last-green
map::

    python scripts/update_window_history.py 11   # 11 = the round now starting

A name counts green in round R when its CORRECTNESS_rR entry matches on
rows + schema + hash (hash_match defaults true for rows-only checks).
The output file is the single source the suite's oldest-first rotation
reads; it is committed so the window is reproducible at judging time.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(
    REPO, "clinical_trials_data_pipeline_analyis_spark", "suite", "window_history.py"
)


def last_green() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        tag = os.path.basename(f).split("_r")[1].split(".")[0]
        if not tag.isdigit():
            # Builder pre-driver snapshots (CORRECTNESS_r{N}_pre.json) are
            # local evidence, not driver verdicts — only driver finals rotate
            # the window.
            continue
        rnd = int(tag)
        for name, v in json.load(open(f)).items():
            ok = (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match", True)
            )
            if ok:
                last[name] = max(last.get(name, 0), rnd)
    return last


def main() -> None:
    current_round = int(sys.argv[1])
    lg = last_green()
    lines = [
        '"""Per-query driver-verdict history (GENERATED — do not hand-edit).',
        "",
        "Regenerated at each round start by scripts/update_window_history.py",
        "from the driver's CORRECTNESS_r*.json artifacts. Consumed by",
        "suite.__init__ to build the oldest-first auto-rotated DRIVER_WINDOW.",
        '"""',
        "",
        f"CURRENT_ROUND = {current_round}",
        "",
        "#: query name -> most recent round with a green driver verdict",
        "#: (rows + schema + value-hash all matching).",
        "LAST_GREEN = {",
    ]
    for name in sorted(lg):
        lines.append(f'    "{name}": {lg[name]},')
    lines += ["}", ""]
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT}: {len(lg)} names, CURRENT_ROUND={current_round}")


if __name__ == "__main__":
    main()
