"""Join operators (SURVEY §2.4).

J1/J2 — interval join: the reference's keyed event-time interval join
(OrderWideApp.java:96-105: order ⋈ detail on id=order_id, detail.ts ∈
[info.ts-5s, info.ts+5s]; PaymentWideApp.java:69-76: payment ⋈ order_wide,
intended [-15 min, 0] — SURVEY §6a.2). In Spark this is one equi-join with a
time-range conjunct; Catalyst plans the equi-part as a shuffled hash /
sort-merge join and evaluates the range as a post-join filter, so the shuffle
is keyed only on the equi key — the correct distribution at any scale.

J3 — dim enrichment: the reference does per-record async RPC to Phoenix with a
Redis cache-aside (DimAsyncFunction.java:40-60, DimUtil.java:25-57,
ThreadPoolUtil.java:29-33 — its scalability weak point, SURVEY §3.3). Spark
replaces the whole machinery with broadcast hash joins: each dim ships once
per executor, lookups are in-memory hash probes inside codegen, no RPC, no
cache invalidation problem.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """Event-time interval join: ``left.on == right.on`` AND
    ``right_ts ∈ [left_ts + lower, left_ts + upper]`` (lower/upper are SQL
    interval literals, e.g. ``"-5 seconds"``/``"5 seconds"``).

    The equi key drives the shuffle; the interval is a cheap codegen'd filter.
    For the streaming variant both sides need watermarks (see
    gmall_spark.streaming.pipelines.interval_join_stream).
    """
    l = left.alias("l")
    r = right.alias("r")
    cond = (F.col(f"l.{on}") == F.col(f"r.{on}")) & (
        F.col(f"r.{right_ts}")
        >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {_iv(lower)}")
    ) & (
        F.col(f"r.{right_ts}")
        <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {_iv(upper)}")
    )
    return l.join(r, cond, how)


def _iv(spec: str) -> str:
    """'-5 seconds' → \"'-5' seconds\" (SQL interval literal)."""
    qty, unit = spec.strip().split(" ", 1)
    return f"'{qty}' {unit}"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (big, skewed) left side's key into
    `salt` sub-keys and explode the right side across all salts, so one hot
    key spreads over `salt` reducers instead of melting a single task.

    AQE's skew-join split (on by default in session.py) handles most skew at
    runtime; explicit salting is for the pathological hot key that exceeds
    even a split partition, or engines/paths where AQE can't rewrite (e.g.
    streaming joins). Cost: right side replicated ×salt — use only when the
    right side is small-ish but above broadcast threshold.

    Only inner/left joins are supported: the right side is exploded ×salt,
    so right/full-outer would emit every unmatched right row `salt` times.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r} — the "
            "exploded right side would duplicate unmatched right rows"
        )
    l = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    r = right.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = l.join(r, [on, "__salt"], how)
    return out.drop("__salt")


def bucket_table(df: DataFrame, table: str, key: str, n_buckets: int = 16) -> None:
    """Write a bucketed, sorted table: later equi-joins/aggs on `key` between
    tables bucketed the same way are planned WITHOUT a shuffle (co-located
    sort-merge join reads matching buckets directly). This is the batch
    answer to 'this join runs every hour on the same key' — pay the shuffle
    once at write time. Verified shuffle-free in tests/test_plans.py."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    # a previous session's managed-table dir survives the in-memory catalog;
    # overwrite can't reclaim a location the catalog doesn't know about
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def dim_enrich(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, str, str]],
    how: str = "left",
    broadcast_dims: bool = True,
) -> DataFrame:
    """Star-schema enrichment: chained dim joins, each broadcast.

    ``dims`` is a list of (dim_df, fact_key, dim_key). Left join by default:
    a missing dim key yields nulls rather than the reference's exception
    (DimUtil.java:47 — SURVEY §6a.4).

    Scale: all dim hash maps must fit in executor memory simultaneously
    (they do for every reference dim); Catalyst collapses the chain into one
    stage of in-memory probes over a single pass of the fact table — zero
    extra shuffles.
    """
    out = fact
    for dim, fact_key, dim_key in dims:
        d = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(d, out[fact_key] == dim[dim_key], how)
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row picks the single nearest right row at-or-
    before its timestamp (``direction="backward"``; ``"forward"`` = at-or-
    after). Left-outer semantics — unmatched left rows keep nulls for the
    right columns. Ties on the timestamp match (at-or-before is inclusive).

    Spark has no ASOF JOIN (DuckDB/Pandas do), and the naive formulations
    die at scale: a range join explodes into O(|matches|) intermediate rows
    before the argmax prunes them, and a windowed self-join rescans. This is
    the union-carry-forward formulation instead: tag both sides, union on a
    common layout, and carry the latest right payload forward with
    ``last(ignorenulls)`` over (key, ts) ordering — ONE shuffle on the key,
    O(n) state, no row explosion, and the sort is the same sort a sort-merge
    join would have done anyway.

    Right rows order before left rows at equal timestamps (secondary sort on
    a side tag), which is exactly the inclusive at-or-before tie rule.

    Output columns: all of ``left``'s, then right's payload columns (the
    right key column is dropped as redundant; its timestamp is kept — for
    gap arithmetic — and must therefore be named differently from
    ``left_ts``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be named differently")
    from pyspark.sql import Window

    rpay = [c for c in right.columns if c != on]
    overlap = set(rpay) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload columns collide with left: {sorted(overlap)}")
    rstruct = F.struct(*[F.col(c) for c in rpay])
    l2 = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(right.select(rstruct).schema[0].dataType).alias("_r"),
    )
    r2 = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(F.struct(*left.columns)).schema[0].dataType).alias("_l"),
        rstruct.alias("_r"),
    )
    order = [F.col("_ts").asc(), F.col("_side").asc()]
    if direction == "forward":
        order = [F.col("_ts").desc(), F.col("_side").asc()]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l2.unionByName(r2)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return matched.select("_l.*", *[F.col(f"_m.{c}").alias(c) for c in rpay])


def range_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    grid: float,
    how: str = "inner",
) -> DataFrame:
    """Range join: match each fact row to every band with
    ``lo <= value < hi`` — WITHOUT the nested-loop plan Spark would pick
    for a bare range predicate.

    Grid bucketing: every band explodes over the width-``grid`` cells it
    covers, facts compute their single cell, and the join becomes an
    EQUI-join on the cell with the range as a residual filter. A
    nested-loop compares every fact against every band (|facts|·|bands|
    work — the 100 TB killer even when the band table broadcasts); the
    bucketed form does one hash probe per fact plus |band_width/grid|
    duplicate band rows, tunable via ``grid``.

    Bands may overlap (a fact matches each); hi is exclusive.
    """
    # The explosion runs one cell PAST ceil(hi/grid)-1: floating division in
    # the fact-side floor(value/grid) can round UP to hi/grid when value sits
    # within ~1 ulp below an hi that is an exact multiple of grid, landing the
    # fact in a cell the tight explosion never covers — a silently dropped
    # in-range row. The extra cell only duplicates a band row once more; the
    # residual lo<=v<hi filter removes any false positives it admits.
    cells = bands.withColumn(
        "_cell",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / grid).cast("long"),
                F.ceil(F.col(hi_col) / grid).cast("long"),
            )
        ),
    )
    probed = facts.withColumn("_cell", F.floor(F.col(value_col) / grid).cast("long"))
    out = probed.join(
        F.broadcast(cells),
        (probed["_cell"] == cells["_cell"])
        & (probed[value_col] >= cells[lo_col])
        & (probed[value_col] < cells[hi_col]),
        how,
    )
    return out.drop("_cell")
