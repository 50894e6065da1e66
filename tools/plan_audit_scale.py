#!/usr/bin/env python
"""Plan audit at scale: re-check that the 100 TB-relevant physical-plan
decisions HOLD on a big corpus, where AQE sees real sizes instead of
sf0.1 toys — dims still broadcast, interval joins still equi-keyed, the
registry-wide scale lint still passes, and skew handling is still armed.

Usage: python tools/plan_audit_scale.py <sf_dir> [entry ...]
Prints one line per check; exits non-zero on any violation.
"""

from __future__ import annotations

import sys

HEADLINE = [
    # entry -> (must_contain, must_not_contain)
    ("order_wide", ["BroadcastHashJoin"], ["CartesianProduct"]),
    # payment ⋈ order_wide is fact⋈fact: AQE broadcasts it at toy scale and
    # correctly DEMOTES to sort-merge once both sides are real — so the
    # invariant is "equi-join, never nested loop", not "broadcast"
    ("payment_wide", ["Join"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    ("province_stats", ["BroadcastHashJoin"], ["CartesianProduct"]),
    ("copurchase_lift", [], ["CartesianProduct"]),
    ("dedup_minhash", [], ["CartesianProduct"]),
    ("embed_ann_lsh", ["FlatMapGroupsInPandas"], ["CartesianProduct"]),
    ("pricing_summary", ["HashAggregate"], ["CartesianProduct"]),
    ("delta_join_ivm", [], ["CartesianProduct"]),
    ("funnel_conversion", ["Window"], ["CartesianProduct"]),
    ("table_checksum_diff", ["HashAggregate"], ["CartesianProduct"]),
    # round-7: the prefix scan must keep its data-sized window bucketed
    # (a bare "Window" with no partitioning would be the regression); the
    # draw probe is the reviewed 64-row broadcast nested loop, so only
    # CartesianProduct is banned
    ("weighted_sample", ["BroadcastHashJoin"], ["CartesianProduct"]),
    ("auc_score", ["HashAggregate", "BroadcastHashJoin"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    ("pareto_frontier", ["BroadcastHashJoin"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    ("rolling_active_users", ["HashAggregate"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    ("dedup_recall_audit", [], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
]


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or [n for n, _, _ in HEADLINE]
    from gmall_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("plan_audit_scale")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    rules = {n: (need, bad) for n, need, bad in HEADLINE}
    failures = []
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        need, bad = rules.get(name, ([], ["CartesianProduct"]))
        missing = [m for m in need if m not in plan]
        present = [b for b in bad if b in plan]
        ok = not missing and not present
        print(f"{name:28s} {'OK' if ok else 'VIOLATION'}"
              + (f" missing={missing} present={present}" if not ok else ""))
        if not ok:
            failures.append(name)
    # AQE must be armed for runtime skew/broadcast decisions at real sizes
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    print(f"{len(names) - len(failures)}/{len(names)} plans scale-clean at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
