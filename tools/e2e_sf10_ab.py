#!/usr/bin/env python
"""sf10 A/B of the production warehouse topology's keyed-state dispatch
(r7 verdict task 3 done-criterion): run streaming_warehouse_e2e at sf10
under each dispatch arm — bucketed (the volume dispatch's own choice at a
220 MB source) vs per-key forced — in its OWN subprocess, verify each arm
against the shared DuckDB oracle, record walls.

Usage: python tools/e2e_sf10_ab.py out.json [sf_dir] [entry]
Child mode: --child <arm> <sf_dir> <entry>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(arm: str, sf_dir: str, entry: str) -> None:
    sys.path.insert(0, REPO)
    os.chdir(REPO)
    if arm != "auto":
        os.environ["SPARK_GRAFT_BUCKETED_STATE"] = "1" if arm == "bucketed" else "0"
    from gmall_spark.session import get_spark
    from gmall_spark.streaming.pipelines import warm_streaming
    import __spark_entry__ as entrymod

    sys.path.insert(0, os.path.join(REPO, "tests"))
    import oracle as orc

    spark = get_spark(f"e2e_ab_{arm}")
    spark.range(1000).count()
    warm_streaming(spark)
    t0 = time.perf_counter()
    df = entrymod.queries()[entry](spark, sf_dir)
    n = df.count()
    wall = round(time.perf_counter() - t0, 1)
    ok, msg = orc.compare(df, orc.duck_connection(sf_dir), entrymod.oracle_sql()[entry])
    print(
        json.dumps(
            {
                "arm": arm,
                "sec": wall,
                "rows": n,
                "oracle_ok": ok,
                "oracle_msg": "" if ok else msg[:300],
                "loadavg_1m": round(os.getloadavg()[0], 1),
            }
        )
    )


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--child":
        child(args[1], args[2], args[3])
        return
    if not args:
        print(__doc__, file=sys.stderr)
        raise SystemExit("e2e_sf10_ab: missing out.json argument")
    out_path = args[0]
    sf_dir = args[1] if len(args) > 1 else ".localdata/sf10"
    entry = args[2] if len(args) > 2 else "streaming_warehouse_e2e"

    arms = {}
    for arm in ("bucketed", "perkey"):
        print(f"e2e_ab: >> {arm}", file=sys.stderr, flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", arm, sf_dir, entry],
            capture_output=True,
            text=True,
        )
        last = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
        if proc.returncode != 0 or not last:
            print(f"e2e_ab: {arm} FAILED\n{proc.stderr[-3000:]}", file=sys.stderr)
            arms[arm] = {"error": proc.stderr[-500:]}
            continue
        arms[arm] = json.loads(last[-1])
        print(f"e2e_ab: {arm}: {arms[arm]}", file=sys.stderr, flush=True)

    art = {
        "metric": "warehouse_e2e_sf10_dispatch_ab",
        "unit": "sec",
        "sf": 10,
        "entry": entry,
        "arms": arms,
        "note": (
            "Each arm in a fresh subprocess; oracle_ok is the shared DuckDB "
            "oracle verified at sf10 (not just the sf0.01 gate). 'bucketed' "
            "is what the volume dispatch picks itself at a 220 MB source."
        ),
    }
    with open(out_path, "w") as fh:
        fh.write(json.dumps(art) + "\n")
    print(json.dumps(art))


if __name__ == "__main__":
    main()
