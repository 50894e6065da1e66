#!/usr/bin/env python
"""A/B prototype runs for pagerank_trade formulations at a scaled dir.

Variants:
  A  the pre-round-6 row-edge formulation (inlined below, kept for A/B)
  B  adjacency-array prototype: group edges into (src, out_deg, dsts[]) once;
     per round a node-sized join + codegen explode replaces the edge-sized
     merge join
  C  row-edge formulation with the per-round ranks join forced broadcast
     (NOT a scale path - ranks is node-sized - measurement only)
  E  the committed entry (extras/graph.pagerank_trade as it currently is)

Usage: python tools/pr_ab.py [sf_dir] [variants...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gmall_spark.extras.graph import BASE, DAMP_DEN, DAMP_NUM, SCALE  # noqa: E402
from gmall_spark.session import get_spark  # noqa: E402
from gmall_spark.sources import load_table  # noqa: E402

ROUNDS = 5


def _edges(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .distinct()
    )
    return pairs.select(F.col("c_node").alias("src"), F.col("s_node").alias("dst")).unionByName(
        pairs.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst"))
    )


def variant_a(spark, sf_dir):
    # the pre-round-6 row-edge formulation, inlined for A/B after the entry
    # switched to the adjacency build
    e = _edges(spark, sf_dir).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ed = e.join(deg, "src").persist()
    ranks = deg.select(F.col("src").alias("node"), F.lit(SCALE).cast("long").alias("rank"))
    for _ in range(ROUNDS):
        contrib = ed.join(ranks, ed.src == ranks.node).select(
            "dst", F.expr("rank div out_deg").alias("c")
        )
        ranks = contrib.groupBy(F.col("dst").alias("node")).agg(_rank_expr())
    from gmall_spark.session import unpersist_with

    return unpersist_with(ranks, ed)


def variant_e(spark, sf_dir):
    # the committed entry (whatever extras/graph.pagerank currently does)
    from gmall_spark.extras.graph import pagerank_trade

    return pagerank_trade(spark, sf_dir)


def _rank_expr():
    return F.expr(f"CAST({BASE} + ({DAMP_NUM} * sum(c)) div {DAMP_DEN} AS BIGINT)").alias("rank")


def variant_b(spark, sf_dir):
    e = _edges(spark, sf_dir).distinct()
    adj = e.groupBy("src").agg(
        F.count(F.lit(1)).alias("out_deg"), F.collect_list("dst").alias("dsts")
    ).persist()
    ranks = adj.select(F.col("src").alias("node"), F.lit(SCALE).cast("long").alias("rank"))
    for _ in range(ROUNDS):
        contrib = adj.join(ranks, adj.src == ranks.node).select(
            F.explode("dsts").alias("dst"), F.expr("rank div out_deg").alias("c")
        )
        ranks = contrib.groupBy(F.col("dst").alias("node")).agg(_rank_expr())
    from gmall_spark.session import unpersist_with

    return unpersist_with(ranks, adj)


def variant_c(spark, sf_dir):
    e = _edges(spark, sf_dir).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ed = e.join(deg, "src").persist()
    ranks = deg.select(F.col("src").alias("node"), F.lit(SCALE).cast("long").alias("rank"))
    for _ in range(ROUNDS):
        contrib = ed.join(F.broadcast(ranks), ed.src == F.col("node")).select(
            "dst", F.expr("rank div out_deg").alias("c")
        )
        ranks = contrib.groupBy(F.col("dst").alias("node")).agg(_rank_expr())
    from gmall_spark.session import unpersist_with

    return unpersist_with(ranks, ed)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1"
    which = sys.argv[2:] or ["A", "B", "C"]
    spark = get_spark("pr_ab")
    spark.range(1000).count()
    builders = {"A": variant_a, "B": variant_b, "C": variant_c, "E": variant_e}
    sums = {}
    for v in which:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = builders[v](spark, sf_dir)
        agg = df.agg(F.count(F.lit(1)).alias("n"), F.sum("rank").alias("s")).collect()[0]
        dt = time.perf_counter() - t0
        sums[v] = (agg["n"], agg["s"])
        print(f"{v}: wall={dt:.1f}s rows={agg['n']} rank_sum={agg['s']}", flush=True)
    if len({s for s in sums.values()}) != 1:
        print("MISMATCH across variants:", sums)
        sys.exit(1)
    print("all variants agree")


if __name__ == "__main__":
    main()
