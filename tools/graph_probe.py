#!/usr/bin/env python
"""Three-decade graph-kernel scaling probe (sf1 → sf10 → sf100): runs the
named graph entries once per decade, each decade in its OWN subprocess —
fresh JVM, fresh Python worker pool, cold caches — so decade ratios measure
the plan, not accumulated session state. The r6 probe protocol, preserved:
SPARK_GRAFT_DRIVER_MEM=64g (the sf100 adjacency cache is ~10 GB of array
payload; the 16 g default evicts it), wall includes the cold scan.

Usage:
  python tools/graph_probe.py out.json [entry ...]          # all 3 decades
  python tools/graph_probe.py --decades sf10,sf100 out.json pagerank_trade

Child mode (internal): --child <sf_dir> <entry> prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

DECADES = {
    "sf1": ".localdata/sf1",
    "sf10": ".localdata/sf10",
    "sf100": ".localdata/sf100",
}
DEFAULT_ENTRIES = ["pagerank_trade", "label_communities"]


def child(sf_dir: str, entry: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from gmall_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("gmall_graph_probe")
    spark.range(1000).count()
    t0 = time.perf_counter()
    n = entrymod.queries()[entry](spark, sf_dir).count()
    print(json.dumps({"sec": round(time.perf_counter() - t0, 1), "rows": n}))


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--child":
        child(args[1], args[2])
        return
    decades = list(DECADES)
    if args and args[0] == "--decades":
        decades = args[1].split(",")
        args = args[2:]
    if not args:
        print(__doc__, file=sys.stderr)
        raise SystemExit("graph_probe: missing out.json argument")
    out_path = args[0]
    entries = args[1:] or DEFAULT_ENTRIES

    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"))
    curve: dict[str, dict[str, float]] = {e: {} for e in entries}
    rows: dict[str, dict[str, int]] = {e: {} for e in entries}
    for e in entries:
        for dec in decades:
            print(f"probe: >> {e} @ {dec}", file=sys.stderr, flush=True)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", DECADES[dec], e],
                capture_output=True, text=True, env=env,
            )
            last = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
            if proc.returncode != 0 or not last:
                print(f"probe: {e} @ {dec} FAILED\n{proc.stderr[-2000:]}", file=sys.stderr, flush=True)
                # keep curve and rows key-aligned on failure (consumers zip
                # them by key): -1.0 marks the failed decade, rows gets None
                curve[e][dec] = -1.0
                rows[e][dec] = None
                continue
            r = json.loads(last[-1])
            curve[e][dec] = r["sec"]
            rows[e][dec] = r["rows"]
            print(f"probe: {e} @ {dec}: {r['sec']}s ({r['rows']} rows)", file=sys.stderr, flush=True)

    art = {
        "metric": "graph_scaling_wall_sec",
        "unit": "sec",
        "sf": 100,
        "curve": curve,
        "rows": rows,
        "value": round(sum(v for c in curve.values() for v in c.values() if v > 0), 1),
        "note": (
            "Per-decade fresh-subprocess solo runs (cold scan included), "
            "SPARK_GRAFT_DRIVER_MEM=64g, r6 probe protocol."
        ),
    }
    with open(out_path, "w") as fh:
        fh.write(json.dumps(art) + "\n")
    print(json.dumps(art))


if __name__ == "__main__":
    main()
