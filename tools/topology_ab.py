#!/usr/bin/env python
"""Paired A/B of the warehouse e2e topologies between two repo states
(r9: the 3-drain sentinel schedule at HEAD~ vs the overlapped 2-drain
schedule in the tree). Each rep runs in a fresh warmed subprocess with the
arm's repo root first on sys.path, ABBA-interleaved; every arm verifies
row count and (optionally) the DuckDB oracle.

Usage:
  python tools/topology_ab.py out.json --old <repo_dir> [--reps 2]
      [--sf <sf_dir>] [entry ...]
Child mode: --child <repo_dir> <sf_dir> <entry>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

THIS_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(repo: str, sf_dir: str, entry: str) -> None:
    sys.path.insert(0, repo)
    os.chdir(repo)
    from gmall_spark.session import get_spark
    from gmall_spark.streaming.pipelines import warm_streaming
    import __spark_entry__ as entrymod

    spark = get_spark("topology_ab")
    spark.range(1000).count()
    warm_streaming(spark)
    queries = entrymod.queries()
    # discarded warm-up run: the FIRST topology run of a session carries
    # 10-30s of one-time cost (r8 drain A/B lesson)
    queries[entry](spark, sf_dir).count()
    t0 = time.perf_counter()
    n = queries[entry](spark, sf_dir).count()
    sec = round(time.perf_counter() - t0, 2)
    print(json.dumps({"sec": sec, "rows": n}))


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--child":
        child(args[1], args[2], args[3])
        return
    out_path = args[0]
    args = args[1:]
    old_repo = None
    reps = 2
    sf_dir = "/root/testdata/sf0.1"
    if "--old" in args:
        i = args.index("--old")
        old_repo = os.path.abspath(args[i + 1])
        args = args[:i] + args[i + 2 :]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    entries = args or ["streaming_warehouse_e2e_append"]
    assert old_repo, "--old <repo_dir> required"

    results: dict[str, dict[str, list]] = {
        e: {"new": [], "old": []} for e in entries
    }
    for entry in entries:
        order = (["new", "old", "old", "new"] * ((reps + 1) // 2))[: 2 * reps]
        for arm in order:
            repo = THIS_REPO if arm == "new" else old_repo
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", repo, sf_dir, entry],
                capture_output=True,
                text=True,
            )
            last = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
            if proc.returncode != 0 or not last:
                print(
                    f"topology_ab: {entry} {arm} FAILED\n{proc.stderr[-1500:]}",
                    file=sys.stderr,
                )
                results[entry][arm].append(None)
                continue
            r = json.loads(last[-1])
            r["loadavg_1m"] = round(os.getloadavg()[0], 1)
            results[entry][arm].append(r)
            print(f"topology_ab: {entry} {arm}: {r}", file=sys.stderr, flush=True)

    art = {
        "metric": "topology_sentinel_overlap_ab_sec",
        "unit": "sec",
        "sf_dir": sf_dir,
        "per_entry": results,
        "note": (
            "Fresh warmed subprocess per rep (first in-session topology run "
            "discarded as warm-up), ABBA-interleaved between the repo states; "
            "rows recorded per rep so an arm that changed results is visible."
        ),
    }
    with open(out_path, "w") as fh:
        fh.write(json.dumps(art) + "\n")
    print(json.dumps(art))


if __name__ == "__main__":
    main()
