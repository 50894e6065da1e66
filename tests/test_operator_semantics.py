"""Sharp-edge semantics of the core operators on crafted inputs: interval
bounds are inclusive (Flink's between() is closed on both ends —
TestDataStreamJoin.java:49-58 demos exactly that), and the bounce pattern at
the reference's literal 10-second window."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gmall_spark.operators.joins import interval_join
from gmall_spark.operators.stateful import detect_bounce

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def _orders(spark):
    return spark.createDataFrame([(1, BASE)], "okey long, o_ts timestamp")


def _details(spark, offsets_ms):
    rows = [
        (i, 1, BASE + dt.timedelta(milliseconds=ms)) for i, ms in enumerate(offsets_ms)
    ]
    return spark.createDataFrame(rows, "d_id long, okey long, d_ts timestamp")


def test_interval_join_bounds_are_inclusive(spark):
    details = _details(
        spark,
        [-5001, -5000, -4999, 0, 4999, 5000, 5001],
    )
    out = interval_join(
        _orders(spark), details, "okey", "o_ts", "d_ts", "-5 seconds", "5 seconds"
    )
    got = sorted(r["d_id"] for r in out.collect())
    # exactly the [-5s, +5s] closed interval: ids 1..5
    assert got == [1, 2, 3, 4, 5]


def test_interval_join_asymmetric_window(spark):
    # the PaymentWide orientation: [0, +15 min] — nothing before the anchor
    details = _details(spark, [-1, 0, 1, 15 * 60 * 1000, 15 * 60 * 1000 + 1])
    out = interval_join(
        _orders(spark), details, "okey", "o_ts", "d_ts", "0 seconds", "15 minutes"
    )
    got = sorted(r["d_id"] for r in out.collect())
    assert got == [1, 2, 3]


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, BASE + dt.timedelta(seconds=off), user, etype)
            for i, (user, off, etype) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_bounce_at_reference_10s_window(spark):
    """UserJumpDetailApp's literal pattern: entry→entry within 10s = match
    bounce; entry with nothing for >10s = timeout bounce; entry followed by a
    non-entry within 10s = NOT a bounce."""
    ev = _events(
        spark,
        [
            (1, 0, "view"),    # e0: entry, next entry at +5s -> match bounce
            (1, 5, "view"),    # e1: entry, next (non-entry) at +8s -> no bounce
            (1, 8, "click"),   # e2
            (1, 30, "view"),   # e3: entry, nothing after -> timeout bounce
            (2, 0, "view"),    # e4: entry, next event at +11s (>10s) -> timeout
            (2, 11, "click"),  # e5
        ],
    )
    out = detect_bounce(ev, "user_id", "ts", "event_id", F.col("event_type") == "view", "10 seconds")
    got = {(r["event_id"], r["bounce_reason"]) for r in out.collect()}
    assert got == {(0, "match"), (3, "timeout"), (4, "timeout")}


def test_connected_components_transitive_chains(spark):
    """a~b and b~c must cluster {a,b,c} even though a~c is not an edge —
    the property one-hop pair resolution misses; plus singleton and
    two-component separation."""
    from gmall_spark.extras.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    edges = spark.createDataFrame(
        [(2, 3), (3, 4), (6, 7), (4, 5)], "src long, dst long"
    )
    got = {
        (r.node, r.cluster_id)
        for r in connected_components(nodes, edges, "id", "src", "dst").collect()
    }
    assert got == {(1, 1), (2, 2), (3, 2), (4, 2), (5, 2), (6, 6), (7, 6)}
