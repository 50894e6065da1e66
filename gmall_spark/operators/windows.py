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
