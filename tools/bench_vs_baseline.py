#!/usr/bin/env python
"""Compare a bench artifact against BASELINE.md's per-query table.

Usage: python tools/bench_vs_baseline.py BENCH.json [--factor 2.0] [--floor 1.0]

Two-class gate (the r4 verdict's ask): an entry is a REGRESSION only when it
is both >factor× its baseline row AND slower than the absolute floor in
seconds. Sub-floor trips are reported separately as noise — at sf0.1 a
0.2s-row entry routinely lands at 0.6s purely from scheduler jitter, and
listing those alongside real regressions buries the signal. Exit code is 1
iff a real regression exists, so the gate is scriptable.
"""

from __future__ import annotations

import argparse
import json

BASELINE = "BASELINE.md"
HEADER = "| query | sf | sec/query (Spark) | notes |"


def read_baseline(path: str = BASELINE) -> dict[str, float]:
    lines = open(path).read().splitlines()
    start = next(i for i, ln in enumerate(lines) if ln.strip() == HEADER)
    rows: dict[str, float] = {}
    for ln in lines[start + 2 :]:
        if not ln.startswith("|"):
            break
        cells = [c.strip() for c in ln.strip().strip("|").split("|")]
        if len(cells) >= 3:
            try:
                rows[cells[0]] = float(cells[2])
            except ValueError:
                pass
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench")
    ap.add_argument("--factor", type=float, default=2.0)
    ap.add_argument("--floor", type=float, default=1.0, help="absolute seconds floor")
    args = ap.parse_args()

    bench = json.load(open(args.bench))["queries"]
    base = read_baseline()
    common = sorted(set(bench) & set(base))
    missing = sorted(set(bench) - set(base))
    failed = sorted(n for n in common if bench[n] < 0)

    regressions, noise = [], []
    tot_b = tot_r = 0.0
    for n in common:
        if bench[n] < 0:
            continue
        tot_b += base[n]
        tot_r += bench[n]
        if base[n] > 0:
            if bench[n] / base[n] > args.factor:
                rec = (n, bench[n], base[n], bench[n] / base[n])
                (regressions if bench[n] > args.floor else noise).append(rec)
        elif bench[n] > args.floor:
            # baseline rounded to 0.00 (sub-5ms row): no ratio exists, so the
            # absolute floor alone decides — otherwise a 0.00 row could never
            # regress no matter how slow it got.
            regressions.append((n, bench[n], base[n], float("inf")))

    regressions.sort(key=lambda r: -r[3])
    noise.sort(key=lambda r: -r[3])
    for tag, rows in (("REGRESSION", regressions), ("noise-trip", noise)):
        for n, got, exp, ratio in rows:
            print(f"{tag}: {n}  {got:.2f}s vs {exp:.2f}s row ({ratio:.1f}x)")
    print(
        json.dumps(
            {
                "entries": len(common),
                "overall_ratio": round(tot_r / tot_b, 3) if tot_b else None,
                "bench_total_sec": round(tot_r, 1),
                "baseline_total_sec": round(tot_b, 1),
                "regressions": [r[0] for r in regressions],
                "noise_trips": [r[0] for r in noise],
                "failed": failed,
                "unbaselined": missing,
                "factor": args.factor,
                "floor_sec": args.floor,
            }
        )
    )
    return 1 if regressions or failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
