"""Windowed aggregation operators (SURVEY §2.5 A1–A5).

The reference implements tumbling windows three times over (DataStream
ReduceFunction+WindowFunction at VisitorStatsApp.java:132-165 and
ProductStatsApp.java:243-284; SQL TUMBLE at KeywordStatsApp.java:50-59 and
ProvinceStatsSqlApp.java:50-68). Here it is one declarative operator:
``groupBy(window(ts, size), *dims).agg(...)`` — Catalyst plans the
partial/final (map-side combine) aggregation automatically, which is the
reference's hand-written ReduceFunction "incremental aggregation" pattern
(SURVEY §4) for free.

Scale note (100 TB): a tumbling-window agg shuffles once on
(window, *dims). Cardinality = windows × dim-combinations, independent of
input rows, so the reduce side stays small even at 1000 executors; the heavy
lifting is the map-side partial agg, which is embarrassingly parallel.
Exact countDistinct adds one extra shuffle (expand + two-phase agg) — prefer
approx_count_distinct at scale unless the oracle demands exact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gmall_spark.functions import window_bounds


def tumbling_stats(
    df: DataFrame,
    ts_col: str,
    size: str,
    dims: Sequence[str],
    aggs: Sequence[Column],
    stamp_bounds: bool = True,
) -> DataFrame:
    """Tumbling event-time window + keyed aggregate + window-meta finalize.

    Mirrors A1 (VisitorStatsApp.java:132-165): key by dims, window by
    ``size``, aggregate, then stamp stt/edt strings from the window bounds.
    """
    out = df.groupBy(F.window(ts_col, size).alias("w"), *dims).agg(*aggs)
    if stamp_bounds:
        stt, edt = window_bounds(F.col("w"))
        out = out.withColumn("stt", stt).withColumn("edt", edt)
    return out.drop("w")


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    dims: Sequence[str],
    value_col: str,
    grains: Sequence[str] = ("10 minutes", "1 hour", "1 day"),
) -> DataFrame:
    """Cascading multi-grain time rollup (the hypertable / continuous-
    aggregate pattern): the finest grain aggregates the raw rows ONCE; every
    coarser grain re-aggregates the previous level's partials. At 100 TB the
    1-day rollup touches |hour-buckets| rows instead of the raw table — the
    cascade is what makes multi-resolution dashboards affordable.

    Only algebraic aggregates cascade (count/sum/min/max — same contract as
    incremental refresh); ``grains`` must go fine → coarse with each grain a
    multiple of the previous (bucket boundaries then nest exactly).

    Each level is persisted before the next derives from it — lazily, the
    union's branches would silently recompute the finest aggregation from
    raw once per grain (Catalyst plans no cross-branch subplan reuse), which
    defeats the cascade; the persist is what makes "aggregate raw once"
    true in the physical plan (asserted in tests/test_plans.py).

    Output: one row per (grain, bucket, dims) with the bucket start
    timestamp; sums in exact decimal.
    """
    from gmall_spark.functions import money

    levels = []
    cached = []  # the persisted frames themselves (not the derived views)
    cur = (
        df.groupBy(F.window(ts_col, grains[0]).alias("w"), *dims)
        .agg(
            F.count(F.lit(1)).alias("row_ct"),
            F.sum(money(value_col)).cast("decimal(18,2)").alias("value_sum"),
            F.min(value_col).alias("value_min"),
            F.max(value_col).alias("value_max"),
        )
        .withColumn("bucket", F.col("w.start"))
        .drop("w")
        .persist()
    )
    cached.append(cur)
    levels.append(cur.withColumn("grain", F.lit(grains[0])))
    for g in grains[1:]:
        cur = (
            cur.groupBy(F.window("bucket", g).alias("w"), *dims)
            .agg(
                F.sum("row_ct").alias("row_ct"),
                F.sum("value_sum").cast("decimal(18,2)").alias("value_sum"),
                F.min("value_min").alias("value_min"),
                F.max("value_max").alias("value_max"),
            )
            .withColumn("bucket", F.col("w.start"))
            .drop("w")
            .persist()
        )
        cached.append(cur)
        levels.append(cur.withColumn("grain", F.lit(g)))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    # Every persisted level is read by the returned union, so none can be
    # unpersisted here — but they must not outlive the result either
    # (repeated bench/registry invocations would accumulate cached
    # partitions). Lifetime is tied to the result: GC of `out` unpersists.
    from gmall_spark.session import unpersist_with

    return unpersist_with(out, *cached)
