#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the registry queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...}

Each query is timed end-to-end (plan + execute + count action); the session
and JVM warm-up are excluded — that measures the engine, not the JIT.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from gmall_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("gmall_spark_bench")
    queries = entrymod.queries()

    # Warm-up so q1 (alphabetically: ann_recall_audit) isn't charged for
    # one-time engine costs: JVM/codegen, the parquet reader path, AND the
    # Python/Arrow worker pool (first pandas_udf spawns the daemon +
    # workers — ~10s on this box, none of it per-query work).
    spark.range(1000).count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    # lambda form: `from __future__ import annotations` stringifies type
    # hints, which pandas_udf's hint inference cannot resolve here
    _warm = pandas_udf(lambda s: s, "long")
    spark.read.parquet(f"{sf_dir}/region.parquet").select(
        _warm(F.monotonically_increasing_id())
    ).count()
    # Streaming machinery warm-up (WAL, state store, the SEPARATE
    # applyInPandasWithState worker pool) — one-time engine cost, not
    # per-query work; without it the first stateful streaming entry is
    # charged ~4s of session setup.
    from gmall_spark.streaming.pipelines import warm_streaming

    warm_streaming(spark)

    timings: dict[str, float] = {}
    for name in sorted(queries):
        # drop persisted intermediates so each query measures itself, not
        # the previous query's cache/GC pressure
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            n = queries[name](spark, sf_dir).count()
        except Exception as exc:  # a failing query must not hide the others
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = -1.0
            continue
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"bench: {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    line = json.dumps(
        {
            "metric": "registry_queries_total_wall_sec",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
        }
    )
    # The driver captures a bounded stdout tail, which truncated the r2
    # artifact mid-JSON; persist the whole line to a file so the round
    # artifact is recoverable regardless of capture limits.
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    except OSError as exc:
        print(f"bench: could not write {out_path}: {exc}", file=sys.stderr)
    # The driver's stdout capture keeps a bounded TAIL — three rounds of
    # BENCH_r{N}.json came back `parsed: null` because the compact headline
    # printed FIRST and the 220-entry full line after it overflowed the
    # window, cutting the headline and the full line's head.  Order matters:
    # full line first (recoverable from BENCH_LOCAL.json regardless), compact
    # single-line summary LAST so whatever tail survives is valid JSON.
    worst = dict(
        sorted(
            ((k, v) for k, v in timings.items() if v >= 0),
            key=lambda kv: -kv[1],
        )[:10]
    )
    print(line)
    print(
        json.dumps(
            {
                "metric": "registry_queries_total_wall_sec",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "n_failed": sum(1 for v in timings.values() if v < 0),
                "worst10": worst,
                "full_artifact": out_path,
            }
        )
    )


if __name__ == "__main__":
    main()
