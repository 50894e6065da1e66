"""TPC-H-shape completion — the 11 remaining classic decision-support shapes
(Q2, Q7, Q8, Q9, Q11, Q13, Q14, Q15, Q20, Q21, Q22), adapted to the reduced
testdata schema (no partsupp / ps_supplycost, no l_receiptdate/l_commitdate):

- partsupp stand-in: the DISTINCT (l_partkey, l_suppkey) pairs observed in
  lineitem; supply cost := the minimum extended price the pair ever shipped
  at (exact decimal — no division anywhere).
- Q21 "late" := shipped more than a year after the order date (the testdata
  has no commit/receipt dates).

Together with the shapes already in queries.py (Q1 pricing_summary, Q3
shipping_priority, Q4 order_priority_ct, Q5 local_supplier_volume, Q6 inside
pricing_summary's revenue arithmetic, Q10 returned_items, Q12
linestatus_priority, Q16 parts_supplier_ct, Q17 small_quantity_revenue, Q18
large_orders, Q19 disjunctive_revenue) this completes all 22 TPC-H query
shapes over the testdata tables.

Engine-parity rules (queries.py header): decimals cast BEFORE aggregation,
final decimal outputs widened to DOUBLE on both sides, every ratio computed
as ONE IEEE division of two identically-derived doubles (deterministic:
same operands → same bits on both engines), years emitted as formatted
strings, counts CAST to BIGINT in DuckDB.

Scale notes per query in the docstrings — the shared posture: dims
(supplier/nation/region/part) broadcast; facts shuffle once on their
join/agg key; correlated subqueries decorrelated into window functions or
agg-and-join-back so lineitem scans stay O(1) per query.

Broadcast nuance: nation/region are BOUNDED dims (25/5 rows at any scale) —
their hints hold at 1000×. part/supplier grow with scale factor; their
explicit hints are sized to the benchmark SFs, and past the executor-memory
point the right move is to drop the hint and let AQE's size-based
promotion pick broadcast vs shuffle at runtime (the filtered sides here —
one region's suppliers, one type's parts — stay far below that point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_spark.functions import money
from gmall_spark.queries import _revenue, register
from gmall_spark.sources import load_table


def _year(col: str):
    """Year as a 4-char string — avoids int32 (Spark) vs int64 (DuckDB)
    value-dtype drift in the driver's hash."""
    return F.date_format(col, "yyyy")


# ---------------------------------------------------------------------------
# TPC-H Q2 shape — min-cost supplier: correlated min decorrelated into a
# window min over the candidate set (one shuffle on p_partkey; supplier/
# nation/region broadcast; part filter pushed to the scan).
# ---------------------------------------------------------------------------
@register(
    "min_cost_supplier",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(l_extendedprice AS DECIMAL(18,2))) AS supplycost
      FROM lineitem GROUP BY 1, 2
    ), eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ), cand AS (
      SELECT p.p_partkey, p.p_name, eu.s_name, eu.n_name,
             CAST(eu.s_acctbal AS DOUBLE) AS s_acctbal, ps.supplycost,
             min(ps.supplycost) OVER (PARTITION BY p.p_partkey) AS min_cost
      FROM part p
      JOIN ps ON ps.l_partkey = p.p_partkey
      JOIN eu ON eu.s_suppkey = ps.l_suppkey
      WHERE p.p_size <= 10 AND p.p_type = 'LARGE'
    )
    SELECT p_partkey, p_name, s_name, n_name, s_acctbal,
           CAST(supplycost AS DOUBLE) AS supplycost
    FROM cand WHERE supplycost = min_cost
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest EUROPE-region supplier per small LARGE-type part; ties kept
    (hash is order-insensitive). partsupp stand-in from lineitem."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(money("l_extendedprice")).alias("supplycost")
    )
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey).join(
        F.broadcast(eu), ps.l_suppkey == F.col("s_suppkey")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            F.col("supplycost").cast("double").alias("supplycost"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 shape — volume shipping between two nations: symmetric nation-pair
# predicate over a 4-table join, grouped by (supp_nation, cust_nation, year).
# Nation dim broadcast twice under different roles; facts shuffle on their
# natural keys only.
# ---------------------------------------------------------------------------
@register(
    "volume_shipping",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           strftime(l.l_shipdate, '%Y') AS l_year,
           CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", _year("l_shipdate").alias("l_year")
    ).agg(F.sum(_revenue()).cast("decimal(18,4)").cast("double").alias("revenue"))


# ---------------------------------------------------------------------------
# TPC-H Q8 shape — national market share: conditional share of revenue per
# order-year. The share is ONE double division of two exactly-derived
# decimal sums (deterministic across engines).
# ---------------------------------------------------------------------------
@register(
    "market_share",
    """
    WITH all_nations AS (
      SELECT strftime(o.o_orderdate, '%Y') AS o_year,
             CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    )
    SELECT o_year,
           CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS DOUBLE) AS nation_volume,
           CAST(CAST(sum(volume) AS DECIMAL(18,4)) AS DOUBLE) AS total_volume,
           CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS DOUBLE)
             / CAST(CAST(sum(volume) AS DECIMAL(18,4)) AS DOUBLE) AS mkt_share
    FROM all_nations GROUP BY 1
    """,
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    volume = _revenue().cast("decimal(18,4)")
    j = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    )
    nat_vol = F.when(F.col("supp_nation") == "NATION_2", volume).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    agg = j.groupBy(_year("o_orderdate").alias("o_year")).agg(
        F.sum(nat_vol).cast("decimal(18,4)").cast("double").alias("nation_volume"),
        F.sum(volume).cast("decimal(18,4)").cast("double").alias("total_volume"),
    )
    return agg.withColumn("mkt_share", F.col("nation_volume") / F.col("total_volume"))


# ---------------------------------------------------------------------------
# TPC-H Q9 shape — product-type profit: profit = revenue − 20% retail cost,
# computed as sum(5·revenue − cost)/5 so the fraction never touches decimal
# division (final ÷5 is one IEEE double op on identical operands).
# ---------------------------------------------------------------------------
@register(
    "product_type_profit",
    """
    SELECT sn.n_name AS nation, strftime(o.o_orderdate, '%Y') AS o_year,
           CAST(CAST(sum(
             CAST(5 * (CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DECIMAL(18,4))
             - CAST(CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4))
           ) AS DECIMAL(18,4)) AS DOUBLE) / 5 AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit per supplier nation and order year for gear parts; cost proxy
    is 20% of retail price (no ps_supplycost in the testdata)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    amount5 = (F.lit(5) * _revenue()).cast("decimal(18,4)") - (
        money("p_retailprice") * money("l_quantity")
    ).cast("decimal(18,4)")
    j = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"), _year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount5).cast("decimal(18,4)").cast("double").alias("_a5"))
        .select("nation", "o_year", (F.col("_a5") / F.lit(5)).alias("profit"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 shape — important stock: per-part value vs a global-total scalar,
# compared via multiplication (value·1500 > total, i.e. share > 1/1500) so no
# fraction is ever materialized. The 1-row total is a broadcast cross join,
# not a collect.
# ---------------------------------------------------------------------------
@register(
    "important_parts",
    """
    WITH pv AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS part_value
      FROM lineitem GROUP BY 1
    )
    SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM pv WHERE part_value * 1500 > (SELECT sum(part_value) FROM pv)
    """,
)
def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    pv = l.groupBy("l_partkey").agg(
        F.sum(money("l_extendedprice")).cast("decimal(18,2)").alias("part_value")
    )
    total = pv.agg(F.sum("part_value").alias("_total"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") * 1500 > F.col("_total"))
        .select("l_partkey", F.col("part_value").cast("double").alias("part_value"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape — customer order-count distribution: left outer join with
# an ON-clause filter (customers with zero qualifying orders count as 0),
# then a distribution over the counts. Two shuffles: custkey, then c_count.
# ---------------------------------------------------------------------------
@register(
    "customer_distribution",
    """
    WITH co AS (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY 1
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM co GROUP BY 1
    """,
)
def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    co = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# TPC-H Q14 shape — promo revenue share: conditional-sum ratio over one
# shipdate-bounded scan, part dim broadcast. Ratio = one double division.
# ---------------------------------------------------------------------------
@register(
    "promo_revenue",
    """
    SELECT
      CAST(CAST(sum(CASE WHEN p.p_type = 'PROMO'
            THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
            ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS DOUBLE) AS promo_rev,
      CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DECIMAL(18,4)) AS DOUBLE) AS total_rev,
      100 * (CAST(CAST(sum(CASE WHEN p.p_type = 'PROMO'
            THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
            ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS DOUBLE)
        / CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DECIMAL(18,4)) AS DOUBLE)) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
    """,
)
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    agg = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).agg(
        F.sum(promo).cast("decimal(18,4)").cast("double").alias("promo_rev"),
        F.sum(_revenue()).cast("decimal(18,4)").cast("double").alias("total_rev"),
    )
    return agg.withColumn(
        "promo_pct", F.lit(100) * (F.col("promo_rev") / F.col("total_rev"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape — top supplier: quarterly revenue rollup, then equality
# against the max (a 1-row broadcast; exact decimal equality keeps ties).
# ---------------------------------------------------------------------------
@register(
    "top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(18,4)) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(
        F.sum(_revenue()).cast("decimal(18,4)").alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("_max"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("_max"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 shape — potential part promotion: suppliers who shipped an
# outsized share (>1/8, ~100 suppliers per part in the testdata) of a
# small-part's total volume. The per-part total is a window sum over the
# (supp, part) rollup — no second lineitem scan; the share test is
# qty·8 > total (no division).
# ---------------------------------------------------------------------------
@register(
    "potential_promotion",
    """
    WITH spq AS (
      SELECT l_suppkey, l_partkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS supp_qty
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      GROUP BY 1, 2
    ), dom AS (
      SELECT l_suppkey, supp_qty,
             sum(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
      FROM spq
    )
    SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
    FROM dom
    JOIN supplier s ON s.s_suppkey = dom.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE dom.supp_qty * 8 > dom.part_qty
    """,
)
def potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    spq = (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(money("l_quantity")).cast("decimal(18,2)").alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        spq.withColumn("part_qty", F.sum("supp_qty").over(w))
        .filter(F.col("supp_qty") * 8 > F.col("part_qty"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape — suppliers who kept orders waiting: the EXISTS / NOT
# EXISTS pair decorrelates into one per-order rollup (distinct suppliers,
# distinct LATE suppliers) joined back to the late lines — lineitem⋈orders,
# the rollup, and the join-back all share the orderkey partitioning, so the
# whole query is one logical shuffle on l_orderkey plus the final name agg.
# ---------------------------------------------------------------------------
@register(
    "waiting_orders",
    """
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s, lineitem l1, orders o
    WHERE s.s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey
      AND o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 365 DAY)
    GROUP BY 1
    """,
)
def waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Late" := shipped >1 year after the order date (no receipt/commit
    dates in the testdata). A supplier waits an order when it is the ONLY
    late supplier on a multi-supplier finalized order; counted per late
    line like the classic query."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    lines = l.join(o, l.l_orderkey == o.o_orderkey).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS"),
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late"),
    )
    late = lines.filter(F.col("is_late")).join(per_order, "l_orderkey")
    qualifying = late.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    return (
        qualifying.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape — global sales opportunity: above-average-balance
# customers with no RECENT orders (the classic "dormant for N years" form —
# every testdata customer has some order), bucketed by a name-substring
# code. The global average is compared via acctbal·count > sum (no
# division); the dormancy test is an anti join against the date-filtered
# orders scan (filter pushed down).
# ---------------------------------------------------------------------------
@register(
    "sales_opportunity",
    """
    WITH pos AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS bal_sum,
             CAST(count(*) AS BIGINT) AS bal_ct
      FROM customer WHERE c_acctbal > 0
    )
    SELECT substr(c.c_name, 17, 2) AS code,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS totacctbal
    FROM customer c, pos
    WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * pos.bal_ct > pos.bal_sum
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1
    """,
)
def sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(money("c_acctbal")).cast("decimal(18,2)").alias("bal_sum"),
        F.count(F.lit(1)).alias("bal_ct"),
    )
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    no_orders = c.join(recent, c.c_custkey == recent.o_custkey, "left_anti")
    return (
        no_orders.crossJoin(F.broadcast(pos))
        .filter(money("c_acctbal") * F.col("bal_ct") > F.col("bal_sum"))
        .groupBy(F.substring("c_name", 17, 2).alias("code"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(money("c_acctbal")).cast("decimal(18,2)").cast("double").alias("totacctbal"),
        )
    )
