"""Graph analytics over relational edges — PageRank as the canonical
iterative algorithm (connected components lives in extras/dedup.py).

Determinism & engine parity: floating-point PageRank is summation-order
dependent, so a distributed run never hashes equal to a single-node oracle.
Ranks here are BIGINT micro-units (1.0 ≡ 1_000_000) and every step is
integer arithmetic — `rank div out_degree` contributions, damping as
``150000 + (850 · Σcontrib) div 1000`` — so Spark and DuckDB agree bit-for-
bit after any number of rounds. Positive operands make floor and truncating
integer division identical across engines.

Scale: per round = one equi-join of the (persisted) degree-annotated edge
list with the current rank table + one sum-groupBy on dst — the standard
Pregel-style round as two shuffles, no driver-side graph, no row explosion.
Rounds are unrolled into the plan (fixed iteration count keeps the oracle
expressible as chained CTEs; for unbounded convergence checkpoint every ~10
rounds to cut lineage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_spark.queries import register
from gmall_spark.sources import load_table

SCALE = 1_000_000  # rank 1.0 in micro-units
DAMP_NUM, DAMP_DEN = 850, 1000  # damping 0.85 as a ratio
BASE = SCALE - SCALE * DAMP_NUM // DAMP_DEN  # (1-d) teleport mass = 150000


def pagerank(edges: DataFrame, src: str, dst: str, rounds: int = 5) -> DataFrame:
    """Integer-exact PageRank over a directed edge list; returns
    (node, rank) after ``rounds`` synchronous iterations.

    Every node must appear as a source (no dangling nodes) — symmetrize the
    edge list first if the graph is not already so; the registry entry does.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # persisted: each round re-references the degree-annotated edges; without
    # this the upstream edge-building DAG re-executes once per round
    ed = e.join(deg, "src").persist()
    ranks = deg.select(F.col("src").alias("node"), F.lit(SCALE).cast("long").alias("rank"))
    for _ in range(rounds):
        contrib = ed.join(ranks, ed.src == ranks.node).select(
            "dst", F.expr("rank div out_deg").alias("c")
        )
        ranks = contrib.groupBy(F.col("dst").alias("node")).agg(
            # `div` (not `/`): integer division keeps the arithmetic exact
            # and engine-portable; `/` would widen to double
            F.expr(f"CAST({BASE} + ({DAMP_NUM} * sum(c)) div {DAMP_DEN} AS BIGINT)").alias(
                "rank"
            )
        )
    from gmall_spark.session import unpersist_with

    return unpersist_with(ranks, ed)


# ---------------------------------------------------------------------------
# Registry entry — PageRank over the customer↔supplier trade graph (distinct
# (o_custkey, l_suppkey) pairs from orders⋈lineitem, symmetrized so both
# partitions of the bipartite graph hold mass and no node dangles). Node ids
# are disambiguated as custkey·2 / suppkey·2+1. The oracle unrolls the same
# five integer-arithmetic rounds as chained CTEs.
# ---------------------------------------------------------------------------
_PR_ROUNDS = 5


def _oracle() -> str:
    head = """
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey * 2 AS c_node, l.l_suppkey * 2 + 1 AS s_node
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), edges AS (
      SELECT c_node AS src, s_node AS dst FROM pairs
      UNION ALL
      SELECT s_node AS src, c_node AS dst FROM pairs
    ), deg AS (
      SELECT src, CAST(count(*) AS BIGINT) AS out_deg FROM edges GROUP BY 1
    ), r0 AS (
      SELECT src AS node, CAST(1000000 AS BIGINT) AS rank FROM deg
    )"""
    body = ""
    for i in range(1, _PR_ROUNDS + 1):
        body += f""", r{i} AS (
      SELECT e.dst AS node,
             CAST(150000 + (850 * sum(r.rank // d.out_deg)) // 1000 AS BIGINT) AS rank
      FROM edges e
      JOIN deg d ON e.src = d.src
      JOIN r{i - 1} r ON e.src = r.node
      GROUP BY 1
    )"""
    return head + body + f"\n    SELECT node, rank FROM r{_PR_ROUNDS}"


@register("pagerank_trade", _oracle())
def pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    edges = pairs.select(F.col("c_node").alias("src"), F.col("s_node").alias("dst")).unionByName(
        pairs.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst"))
    )
    return pagerank(edges, "src", "dst", rounds=_PR_ROUNDS)
