#!/usr/bin/env python
"""Regenerate BASELINE.md's per-query sf0.1 table from N bench artifacts.

Usage: python tools/update_baseline.py RUN1.json RUN2.json [RUN3.json ...]

Each artifact is a bench.py output ({"queries": {name: sec}}). The table row
becomes the per-entry MEDIAN across the runs (the documented recording
discipline). Entries present in the artifacts but absent from the old table
get a "r4 new baseline" note; previously-baselined entries keep their note
history with an "r4:" prefix recording the refresh. Entries in the old table
but NOT in the artifacts are dropped (they no longer exist in the registry).
"""

from __future__ import annotations

import json
import re
import statistics
import sys

PATH = "BASELINE.md"
HEADER = "| query | sf | sec/query (Spark) | notes |"


def main() -> None:
    runs = [json.load(open(p))["queries"] for p in sys.argv[1:]]
    assert runs, "need at least one bench artifact"
    names = sorted(set().union(*[set(r) for r in runs]))
    med = {
        n: round(statistics.median([r[n] for r in runs if n in r and r[n] >= 0]), 2)
        for n in names
    }

    lines = open(PATH).read().splitlines(keepends=True)
    start = next(i for i, ln in enumerate(lines) if ln.strip() == HEADER)
    end = start + 2
    old_notes: dict[str, str] = {}
    while end < len(lines) and lines[end].startswith("|"):
        cells = [c.strip() for c in lines[end].strip().strip("|").split("|")]
        if len(cells) >= 4:
            old_notes[cells[0]] = cells[3]
        end += 1

    rows = []
    for n in names:
        if n in old_notes:
            prev = old_notes[n]
            note = f"r4 refresh{('; was ' + prev) if prev else ''}"
        else:
            note = "r4 new baseline"
        rows.append(f"| {n} | 0.1 | {med[n]:.2f} | {note} |\n")

    out = lines[: start + 2] + rows + lines[end:]
    open(PATH, "w").writelines(out)
    dropped = sorted(set(old_notes) - set(names))
    print(f"rewrote {len(rows)} rows ({sum(1 for n in names if n not in old_notes)} new); dropped {dropped}")


if __name__ == "__main__":
    main()
