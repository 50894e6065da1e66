#!/usr/bin/env python
"""Paired core-count A/B for the multi-batch / TWS streaming family (r8
verdict item 5: 4/9 mb entries timed SLOWER at 32 cores than 8).

Runs each entry under BOTH core counts in fresh warmed subprocesses,
interleaved ABAB so a host burst hits both arms, and records every rep.

Usage:
  python tools/mb_width_ab.py out.json [--reps 2] [--cpus 32,8] entry ...

Child mode (internal): --child <cpus> <entry> [entry ...] prints one JSON
line {entry: [sec, ...]} timed with bench.py's methodology (warmed session,
clearCache between entries).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def child(cpus: str, names: list[str]) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    from gmall_spark.session import get_spark
    from gmall_spark.streaming.pipelines import warm_streaming
    import __spark_entry__ as entrymod

    spark = get_spark(f"mb_width_ab_c{cpus}")
    spark.range(1000).count()
    warm_streaming(spark)
    queries = entrymod.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out: dict[str, float] = {}
    for name in names:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).count()
        out[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps(out))


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--child":
        child(args[1], args[2:])
        return
    reps = 2
    cpus = ["32", "8"]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    if "--cpus" in args:
        i = args.index("--cpus")
        cpus = args[i + 1].split(",")
        args = args[:i] + args[i + 2 :]
    out_path, names = args[0], args[1:]

    results: dict[str, dict[str, list[float]]] = {
        n: {c: [] for c in cpus} for n in names
    }
    loads: list[float] = []
    for rep in range(reps):
        for c in cpus:  # interleaved: every rep covers every arm back-to-back
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", c] + names,
                capture_output=True,
                text=True,
            )
            last = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
            if proc.returncode != 0 or not last:
                print(
                    f"mb_width_ab: c{c} rep{rep} FAILED\n{proc.stderr[-1500:]}",
                    file=sys.stderr,
                )
                continue
            for k, v in json.loads(last[-1]).items():
                results[k][c].append(v)
            loads.append(round(os.getloadavg()[0], 1))
            print(f"mb_width_ab: rep{rep} c{c}: {last[-1]}", file=sys.stderr, flush=True)

    art = {
        "metric": "mb_family_cpus_ab_sec",
        "unit": "sec",
        "per_entry": results,
        "loadavg_after_each_child": loads,
        "note": (
            "Fresh warmed subprocess per (rep, cpus) arm, ABAB-interleaved; "
            "bench.py timing methodology inside each child."
        ),
    }
    with open(out_path, "w") as fh:
        fh.write(json.dumps(art) + "\n")
    print(json.dumps(art))


if __name__ == "__main__":
    main()
