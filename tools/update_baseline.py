#!/usr/bin/env python
"""Regenerate BASELINE.md's per-query sf0.1 table from N bench artifacts.

Usage: python tools/update_baseline.py [--tag rN] RUN1.json [RUN2.json ...]

Each artifact is a bench.py output ({"queries": {name: sec}}). The table row
becomes the per-entry MEDIAN across the runs (the documented recording
discipline), over non-negative timings only (bench records failures as -1).
An entry that failed in EVERY supplied run keeps its previous row untouched
and is reported — a transient failure must not silently drop or corrupt a
baseline row. Entries new to the table get a "<tag> new baseline" note;
previously-baselined entries keep their note history behind a "<tag>
refresh". Entries in the old table but in NO artifact (not even as a
failure) are dropped — they no longer exist in the registry.
"""

from __future__ import annotations

import argparse
import json
import statistics

PATH = "BASELINE.md"
HEADER = "| query | sf | sec/query (Spark) | notes |"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="refresh", help="round tag for notes, e.g. r5")
    ap.add_argument("artifacts", nargs="+")
    args = ap.parse_args()
    runs = [json.load(open(p))["queries"] for p in args.artifacts]
    names = sorted(set().union(*[set(r) for r in runs]))
    med: dict[str, float] = {}
    all_failed: list[str] = []
    for n in names:
        vals = [r[n] for r in runs if n in r and r[n] >= 0]
        if vals:
            med[n] = round(statistics.median(vals), 2)
        else:
            all_failed.append(n)

    lines = open(PATH).read().splitlines(keepends=True)
    start = next(i for i, ln in enumerate(lines) if ln.strip() == HEADER)
    end = start + 2
    old_rows: dict[str, str] = {}
    old_notes: dict[str, str] = {}
    while end < len(lines) and lines[end].startswith("|"):
        cells = [c.strip() for c in lines[end].strip().strip("|").split("|")]
        if len(cells) >= 4:
            old_rows[cells[0]] = lines[end]
            old_notes[cells[0]] = cells[3]
        end += 1

    rows = []
    for n in names:
        if n in all_failed:
            if n in old_rows:  # keep the prior row; never baseline a failure
                rows.append(old_rows[n])
            continue
        if n in old_notes:
            prev = old_notes[n]
            note = f"{args.tag} refresh{('; was ' + prev) if prev else ''}"
        else:
            note = f"{args.tag} new baseline"
        rows.append(f"| {n} | 0.1 | {med[n]:.2f} | {note} |\n")

    out = lines[: start + 2] + rows + lines[end:]
    open(PATH, "w").writelines(out)
    dropped = sorted(set(old_rows) - set(names))
    print(
        f"rewrote {len(rows)} rows "
        f"({sum(1 for n in med if n not in old_notes)} new); "
        f"dropped {dropped}; failed-in-all-runs (row kept): {all_failed}"
    )


if __name__ == "__main__":
    main()
