#!/usr/bin/env python
"""Profile pagerank_trade at a scaled dir: wall time + exchange count in the
final plan (how many shuffles the 5-round loop actually plans)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1"
    spark = get_spark("pr_prof")
    spark.range(1000).count()

    from gmall_spark.extras.graph import pagerank_trade

    df = pagerank_trade(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_ex = plan.count("Exchange hashpartitioning")
    t0 = time.perf_counter()
    n = df.count()
    dt = time.perf_counter() - t0
    print(f"rows={n} wall={dt:.1f}s exchanges_planned={n_ex}")
    if os.environ.get("PR_EXPLAIN"):
        df.explain("formatted")


if __name__ == "__main__":
    main()
