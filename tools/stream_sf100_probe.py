#!/usr/bin/env python
"""sf100 probe for the bucketed streaming-state family (r7 verdict task 4 /
carried r6 task 6): run the heaviest bucketed keyed-state entries at sf100
(2.2 GB events source, ~6M keys) with auto widths, one entry per fresh
subprocess (cold JVM + worker pool, the graph-probe protocol), and record
wall/rows per entry next to their sf10 rows for the decade ratio.

Usage: python tools/stream_sf100_probe.py out.json [sf_dir] [entry ...]
Child mode: --child <sf_dir> <entry>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_ENTRIES = [
    "streaming_mb_bucketed_uv",
    "streaming_mb_bucketed_is_new",
    "streaming_mb_bucketed_bounce",
    "streaming_bucketed_uv",
]


def child(sf_dir: str, entry: str) -> None:
    sys.path.insert(0, REPO)
    os.chdir(REPO)
    from gmall_spark.session import get_spark
    from gmall_spark.streaming.pipelines import warm_streaming
    import __spark_entry__ as entrymod

    spark = get_spark("stream_sf100_probe")
    spark.range(1000).count()
    warm_streaming(spark)
    t0 = time.perf_counter()
    n = entrymod.queries()[entry](spark, sf_dir).count()
    print(
        json.dumps(
            {
                "sec": round(time.perf_counter() - t0, 1),
                "rows": n,
                "loadavg_1m": round(os.getloadavg()[0], 1),
            }
        )
    )


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--child":
        child(args[1], args[2])
        return
    if not args:
        print(__doc__, file=sys.stderr)
        raise SystemExit("stream_sf100_probe: missing out.json argument")
    out_path = args[0]
    sf_dir = args[1] if len(args) > 1 else ".localdata/sf100"
    entries = args[2:] or DEFAULT_ENTRIES

    rows: dict[str, dict] = {}
    for e in entries:
        print(f"probe: >> {e}", file=sys.stderr, flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", sf_dir, e],
            capture_output=True,
            text=True,
        )
        last = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
        if proc.returncode != 0 or not last:
            print(f"probe: {e} FAILED\n{proc.stderr[-3000:]}", file=sys.stderr)
            rows[e] = {"error": proc.stderr[-400:]}
            continue
        rows[e] = json.loads(last[-1])
        print(f"probe: {e}: {rows[e]}", file=sys.stderr, flush=True)

    ok = [r for r in rows.values() if "sec" in r]
    art = {
        "metric": "bucketed_streaming_sf100_wall_sec",
        "unit": "sec",
        "sf": 100,
        "rows": rows,
        "value": round(sum(r["sec"] for r in ok), 1),
        "note": (
            "Per-entry fresh-subprocess solo runs at a 2.2 GB events source "
            "(~6M keys), auto stream widths; compare each row against its "
            "sf10 twin in BENCH_r06_bucketed_state.json / AUDIT artifacts "
            "for the decade ratio."
        ),
    }
    with open(out_path, "w") as fh:
        fh.write(json.dumps(art) + "\n")
    print(json.dumps(art))


if __name__ == "__main__":
    main()
