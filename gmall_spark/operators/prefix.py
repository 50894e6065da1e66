"""Distributed prefix sum — the scan primitive behind weighted sampling,
rank statistics (AUC), and cumulative-distribution queries.

The naive Spark formulation is ``sum(x) OVER (ORDER BY k)`` with no
PARTITION BY, which Catalyst plans as a SINGLE-partition window — the whole
table funnels through one task, the textbook 100 TB killer. This operator is
the classic two-level scan instead:

1. bucket every row by a coarse, ORDER-ALIGNED bucket expression (any
   monotone function of the order key — e.g. ``floor(key / 1000)``);
2. aggregate per-bucket partial sums (partial-agg groupBy — one shuffle of
   |buckets| rows, map-side combined);
3. prefix-sum the bucket partials (|buckets| rows — a window over the
   bucket table, safe because buckets are orders of magnitude fewer than
   rows; at extreme scale recurse one more level);
4. broadcast-join the bucket offsets back and add the within-bucket running
   sum (window PARTITIONED by bucket — parallel again).

Net: two shuffles of the data (bucket groupBy feeds off the same scan; the
within-bucket window shuffles on bucket), never a single-partition stage.
All arithmetic stays in whatever exact type the caller supplies (BIGINT /
DECIMAL), so the result is engine-reproducible bit-for-bit.

No reference counterpart — Flink's keyed streams never need a global scan —
but the training-data pipeline does (weighted mixture draws, CDF-based
splits), so it's first-class here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    bucket: Column,
    out_col: str = "cum",
    inclusive: bool = True,
) -> DataFrame:
    """Add ``out_col`` = running sum of ``value_col`` over the GLOBAL order
    given by ``order_cols``, without a single-partition window.

    ``bucket`` must be monotone non-decreasing in the order: every row of
    bucket b sorts before every row of bucket b+1. (A violation silently
    misorders the scan — callers derive the bucket from the leading order
    column, e.g. ``F.floor(F.col("k") / 1000)``.)

    ``inclusive=False`` gives the exclusive scan (sum of strictly-preceding
    rows), the form interval lookups want.
    """
    b = df.withColumn("__bucket", bucket)

    # Level 1: per-bucket totals. |buckets| rows after a map-side-combined
    # groupBy — the only full-data shuffle besides the within-bucket window.
    totals = b.groupBy("__bucket").agg(F.sum(value_col).alias("__bucket_total"))

    # Level 2: prefix over the bucket table. Single-partition window over
    # |buckets| rows — bounded by design (caller sizes the bucket so this
    # is ~1e3-1e6 rows, never |data|).
    w_b = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__bucket_offset", F.coalesce(F.sum("__bucket_total").over(w_b), F.lit(0))
    ).select("__bucket", "__bucket_offset")

    # Level 3: within-bucket running sum — windows partitioned by bucket run
    # parallel; the offset join broadcasts (|buckets| rows).
    frame = (Window.unboundedPreceding, 0 if inclusive else -1)
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(*order_cols)
        .rowsBetween(*frame)
    )
    local = F.coalesce(F.sum(value_col).over(w_in), F.lit(0))
    return (
        b.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, (F.col("__bucket_offset") + local).cast("long"))
        .drop("__bucket", "__bucket_offset")
    )
