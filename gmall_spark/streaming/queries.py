"""Streaming registry entries (rows-only checks — append-mode streaming
output is batch-output minus watermark stragglers, so a value-hash against
the batch oracle would be flaky by design; tests/test_streaming.py asserts
the exact equivalence modulo stragglers instead).

Each entry drives a real Structured Streaming query (availableNow trigger →
memory sink) over the testdata and returns the result DataFrame.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_spark.queries import register
from gmall_spark.streaming.pipelines import (
    interval_join_stream,
    run_to_memory,
    stream_events,
    windowed_stats_stream,
    windowed_uv_stream,
)
from gmall_spark.streaming.stateful import (
    dedup_daily_stream,
    detect_bounce_stream,
    fix_is_new_stream,
)


def _name(prefix: str) -> str:
    return f"{prefix}_{uuid.uuid4().hex[:8]}"


@register("streaming_visitor_stats")
def streaming_visitor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 as a live streaming query: watermarked tumbling window multi-agg."""
    ev = stream_events(spark, sf_dir)
    out = windowed_stats_stream(
        ev,
        "ts",
        "10 minutes",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("pv_ct"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(18,2)").alias("dur_sum"),
        ],
    )
    return run_to_memory(out, _name("s_visitor"))


@register("streaming_unique_visit")
def streaming_unique_visit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2 as keyed streaming state (applyInPandasWithState)."""
    return run_to_memory(dedup_daily_stream(stream_events(spark, sf_dir)), _name("s_uv"))


@register("streaming_is_new_repair")
def streaming_is_new_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1 as keyed streaming state."""
    return run_to_memory(fix_is_new_stream(stream_events(spark, sf_dir)), _name("s_isnew"))


@register("streaming_bounce_detect")
def streaming_bounce_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3 — CEP-with-timeout via event-time timers."""
    return run_to_memory(
        detect_bounce_stream(stream_events(spark, sf_dir)), _name("s_bounce")
    )


@register("streaming_payment_wide")
def streaming_payment_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — stream-stream interval join (purchase ⋈ preceding view ≤15min)."""
    ev = stream_events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view")
    buys = ev.filter(F.col("event_type") == "purchase")
    joined = interval_join_stream(
        views, buys, "user_id", "ts", "ts", "0 minutes", "15 minutes"
    ).select(
        F.col("l.event_id").alias("view_id"),
        F.col("r.event_id").alias("purchase_id"),
        F.col("l.user_id").alias("user_id"),
    )
    return run_to_memory(joined, _name("s_paywide"))


@register("streaming_session_stats")
def streaming_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (session_window) — the streaming twin of the
    batch `sessionize` query; equivalence tested in tests/test_streaming.py."""
    from gmall_spark.streaming.pipelines import session_stats_stream

    out = session_stats_stream(stream_events(spark, sf_dir), "ts", "user_id", "30 minutes")
    return run_to_memory(out, _name("s_sess"))


@register("streaming_province_uv")
def streaming_province_uv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4's exact streaming count(distinct): dedup-then-count rewrite."""
    out = windowed_uv_stream(
        stream_events(spark, sf_dir), "ts", "10 minutes", "user_id", ["event_type"]
    )
    return run_to_memory(out, _name("s_uvwin"))
