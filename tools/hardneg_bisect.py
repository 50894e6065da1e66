#!/usr/bin/env python
"""One-run bisect for the r7 verdict's hard_negatives sf10 flag (53.8s ->
131.9s in AUDIT_sf10_r07): was it the r6-advice slab-floor change
(_block_rows floor 16 -> 1, similarity.py) or bench-window host tenancy?

Static analysis says the floor CANNOT bite at this entry's sf10 size —
n_index = 200k rows x 8 B/cell => block height min(512, 256MiB/1.6MB) = 167
under either floor — so the A/B should time identical and the artifact
records that plus the re-timed wall. Each arm runs in its own subprocess
(fresh JVM + worker pool, the audit protocol).

Usage: python tools/hardneg_bisect.py out.json [sf_dir]
Child mode: --child <floor> <sf_dir>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def child(floor: int, sf_dir: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import gmall_spark.extras.similarity as sim

    if floor != 1:
        budget = sim._SLAB_BUDGET_BYTES

        def pinned(n_index: int, bytes_per_cell: int, _f=floor) -> int:
            return max(_f, min(512, budget // max(1, n_index * bytes_per_cell)))

        sim._block_rows = pinned

    from gmall_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("hardneg_bisect")
    spark.range(1000).count()
    n_index = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    blk = sim._block_rows(n_index, 8)
    t0 = time.perf_counter()
    n = entrymod.queries()["hard_negatives"](spark, sf_dir).count()
    print(
        json.dumps(
            {
                "floor": floor,
                "block_rows": blk,
                "n_index": n_index,
                "sec": round(time.perf_counter() - t0, 1),
                "rows": n,
                "loadavg_1m": round(os.getloadavg()[0], 1),
            }
        )
    )


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--child":
        child(int(args[1]), args[2])
        return
    if not args:
        print(__doc__, file=sys.stderr)
        raise SystemExit("hardneg_bisect: missing out.json argument")
    out_path = args[0]
    sf_dir = args[1] if len(args) > 1 else ".localdata/sf10"

    arms = {}
    for floor in (1, 16):
        print(f"bisect: >> floor={floor}", file=sys.stderr, flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(floor), sf_dir],
            capture_output=True,
            text=True,
        )
        last = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
        if proc.returncode != 0 or not last:
            print(f"bisect: floor={floor} FAILED\n{proc.stderr[-2000:]}", file=sys.stderr)
            arms[str(floor)] = {"error": proc.stderr[-500:]}
            continue
        arms[str(floor)] = json.loads(last[-1])
        print(f"bisect: floor={floor}: {arms[str(floor)]}", file=sys.stderr, flush=True)

    art = {
        "metric": "hard_negatives_sf10_slab_floor_bisect",
        "unit": "sec",
        "sf": 10,
        "arms": arms,
        "note": (
            "r7 verdict task 2: A/B of _block_rows floor 16 vs 1 at sf10. "
            "Both arms compute the same block height (167) at the 200k-row "
            "index, so equal walls adjudicate the r7 audit's 131.9s row as "
            "bench-window tenancy, not the slab-floor change."
        ),
    }
    with open(out_path, "w") as fh:
        fh.write(json.dumps(art) + "\n")
    print(json.dumps(art))


if __name__ == "__main__":
    main()
