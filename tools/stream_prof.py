#!/usr/bin/env python
"""Time individual registry entries (solo or a list) — the re-timing harness
for bench triage. Usage:

    python tools/stream_prof.py [--sf DIR] entry [entry ...]
    python tools/stream_prof.py --all-streaming

Prints per-entry wall seconds (median-of-N with --n) after the standard
bench warm-up, as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=1)
    ap.add_argument("--all-streaming", action="store_true")
    args = ap.parse_args()

    from gmall_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("stream_prof")
    queries = entrymod.queries()
    names = args.entries or []
    if args.all_streaming:
        names = sorted(n for n in queries if n.startswith("streaming_"))
    bad = [n for n in names if n not in queries]
    if bad:
        sys.exit(f"unknown entries: {bad}")

    # same warm-up as bench.py
    spark.range(1000).count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.read.parquet(f"{args.sf}/region.parquet").select(
        _warm(F.monotonically_increasing_id())
    ).count()
    from gmall_spark.streaming.pipelines import warm_streaming

    warm_streaming(spark)

    out: dict[str, list[float]] = {}
    for name in names:
        runs = []
        for _ in range(args.n):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n_rows = queries[name](spark, args.sf).count()
            runs.append(round(time.perf_counter() - t0, 3))
            print(f"prof: {name}: {runs[-1]:.3f}s ({n_rows} rows)", file=sys.stderr)
        out[name] = runs
    print(json.dumps({"sf": args.sf, "runs": out, "total_first": round(sum(v[0] for v in out.values()), 3)}))


if __name__ == "__main__":
    main()
