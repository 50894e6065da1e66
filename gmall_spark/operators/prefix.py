"""Distributed prefix scans — the scan primitive behind weighted sampling,
rank statistics (AUC), cumulative distributions, and frontier queries.

The naive Spark formulation is ``sum(x) OVER (ORDER BY k)`` with no
PARTITION BY, which Catalyst plans as a SINGLE-partition window — the whole
table funnels through one task, the textbook 100 TB killer. These operators
are the classic two-level scan instead:

1. bucket every row by a coarse, ORDER-ALIGNED bucket expression (any
   monotone function of the order key — e.g. ``floor(key / 1000)``);
2. aggregate per-bucket partials (partial-agg groupBy — one shuffle of
   |buckets| rows, map-side combined);
3. scan the bucket partials (|buckets| rows — a window over the bucket
   table, safe because buckets are orders of magnitude fewer than rows; at
   extreme scale recurse one more level);
4. broadcast-join the bucket offsets back and combine with the
   within-bucket running value (window PARTITIONED by bucket — parallel).

Net: two shuffles of the data (bucket groupBy feeds off the same scan; the
within-bucket window shuffles on bucket), never a single-partition stage.
Sum arithmetic stays in whatever exact type the caller supplies (BIGINT /
DECIMAL), so results are engine-reproducible bit-for-bit; max is exact by
construction.

No reference counterpart — Flink's keyed streams never need a global scan —
but the training-data pipeline does (weighted mixture draws, CDF-based
splits, Pareto frontiers), so it's first-class here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _two_level_scan(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    bucket: Column,
    out_col: str,
    inclusive: bool,
    kind: str,
) -> DataFrame:
    """Shared two-level machinery; ``kind`` in {"sum", "max"}.

    ``bucket`` must be monotone non-decreasing in the order: every row of
    bucket b sorts before every row of bucket b+1. (A violation silently
    misorders the scan — callers derive the bucket from the leading order
    column.) ``inclusive=False`` gives the exclusive scan (strictly
    preceding rows); for "sum" the empty prefix is 0, for "max" it is NULL.
    """
    agg = F.sum if kind == "sum" else F.max
    b = df.withColumn("__bucket", bucket)

    # Level 1: per-bucket partials — the only full-data shuffle besides the
    # within-bucket window (|buckets| rows after map-side combine).
    totals = b.groupBy("__bucket").agg(agg(value_col).alias("__bucket_part"))

    # Level 2: scan over the bucket table. Single-partition window over
    # |buckets| rows — bounded by design (caller sizes the bucket so this
    # is ~1e3-1e6 rows, never |data|). Always EXCLUSIVE: the offset a row
    # needs is the combine over strictly-earlier buckets.
    w_b = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn("__bucket_off", agg("__bucket_part").over(w_b)).select(
        "__bucket", "__bucket_off"
    )

    # Level 3: within-bucket running value — windows partitioned by bucket
    # run parallel; the offset join broadcasts (|buckets| rows).
    frame = (Window.unboundedPreceding, 0 if inclusive else -1)
    w_in = Window.partitionBy("__bucket").orderBy(*order_cols).rowsBetween(*frame)
    local = agg(value_col).over(w_in)
    if kind == "sum":
        # No output cast: Spark's sum() already picks the right widened
        # type per input (integral → BIGINT, DECIMAL(p,s) → DECIMAL(p+10,s),
        # floating → DOUBLE), and the + of two partials stays in it. A
        # fixed cast here would silently truncate DECIMAL/DOUBLE callers.
        combined = F.coalesce(F.col("__bucket_off"), F.lit(0)) + F.coalesce(
            local, F.lit(0)
        )
    else:
        # max identity is NULL: greatest() ignores nulls only via coalesce
        # gymnastics — an all-null prefix must stay NULL
        combined = F.when(
            F.col("__bucket_off").isNull(), local
        ).otherwise(
            F.when(local.isNull(), F.col("__bucket_off")).otherwise(
                F.greatest(F.col("__bucket_off"), local)
            )
        )
    return (
        b.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, combined)
        .drop("__bucket", "__bucket_off")
    )


def prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    bucket: Column,
    out_col: str = "cum",
    inclusive: bool = True,
) -> DataFrame:
    """Add ``out_col`` = running sum of ``value_col`` over the GLOBAL order
    given by ``order_cols``, without a single-partition window."""
    return _two_level_scan(df, order_cols, value_col, bucket, out_col, inclusive, "sum")


def prefix_max(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    bucket: Column,
    out_col: str = "cummax",
    inclusive: bool = True,
) -> DataFrame:
    """Running maximum over the global order — the frontier/skyline scan.
    The exclusive form yields NULL for the first row (empty prefix), which
    callers treat as "nothing precedes"."""
    return _two_level_scan(df, order_cols, value_col, bucket, out_col, inclusive, "max")
