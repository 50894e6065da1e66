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
