"""Regenerate the '§2 rows -> oracle-checked queries' table in
COVERAGE.md from the live registry (suite.coverage()), leaving the
surrounding prose sections untouched. Also refreshes the query count in
the intro. Run after registering queries:

    PYTHONPATH=. python scripts/gen_coverage.py
"""

from __future__ import annotations

import re
from pathlib import Path

from clinical_trials_data_pipeline_analyis_spark.suite import coverage, registry

PATH = Path(__file__).resolve().parent.parent / "COVERAGE.md"

HEADER = "## §2 rows → oracle-checked queries"
NEXT = "## §2 rows proven by the pipeline plans + pytest"


def main() -> None:
    reg = registry()
    cov = coverage()
    lines = [HEADER, "", "| op | queries |", "|---|---|"]
    for op in sorted(cov):
        qs = ", ".join(f"`{q}`" for q in sorted(set(cov[op])))
        lines.append(f"| {op} | {qs} |")
    table = "\n".join(lines) + "\n\n"

    text = PATH.read_text()
    start = text.index(HEADER)
    end = text.index(NEXT)
    text = text[:start] + table + text[end:]
    n = len(reg)
    text = re.sub(r"\b\d+ queries, ALL with full", f"{n} queries, ALL with full", text)
    PATH.write_text(text)
    print(f"regenerated {PATH.name}: {len(cov)} operator rows, {n} queries")


if __name__ == "__main__":
    main()
