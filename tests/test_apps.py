"""End-to-end app tests: behavior-log JSON in → stats out, mirroring the
reference's job topology (SURVEY §3). The fixture synthesizes the log from
the driver's events table deterministically, so expected values are
derivable from events directly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmall_spark.apps.fixtures import behavior_log_json
from gmall_spark.apps.warehouse import (
    base_log_app,
    keyword_stats_app,
    product_stats_app,
    unique_visit_app,
    user_jump_app,
    visitor_stats_app,
)
from gmall_spark.sources import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def streams(spark):
    raw = behavior_log_json(spark, SF)
    out = base_log_app(raw)
    for v in out.values():
        v.cache()
    return out


@pytest.fixture(scope="module")
def ev_counts(spark):
    ev = load_table(spark, SF, "events")
    return {r["event_type"]: r["n"] for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}


def test_base_log_split(streams, ev_counts):
    total = sum(ev_counts.values())
    n_start = streams["start"].count()
    n_page = streams["page"].count()
    n_display = streams["display"].count()
    n_dirty = streams["dirty"].count()
    assert n_dirty == 0
    assert n_start == ev_counts["signup"]
    assert n_page == total - ev_counts["signup"]
    # displays only exist on purchase events; split keeps one row per log
    # record (display stream rows explode later)
    assert n_display == 2 * ev_counts["purchase"]


def test_is_new_repair_in_app(streams, spark):
    # after repair, at most one is_new=1 record per mid; and that record is
    # the mid's earliest event among those that claimed is_new=1
    pages_and_starts = streams["page"].select("common", "ts").unionByName(
        streams["start"].select("common", "ts")
    )
    per_mid = (
        pages_and_starts.filter(F.col("common.is_new") == "1")
        .groupBy("common.mid")
        .agg(F.count("*").alias("n"))
    )
    assert per_mid.filter(F.col("n") > 1).count() == 0


def test_unique_visit_app(streams, spark):
    uv = unique_visit_app(streams["page"])
    # one row per (mid, day) at most
    dup = uv.groupBy("mid", "dt").agg(F.count("*").alias("n")).filter(F.col("n") > 1)
    assert dup.count() == 0
    # equals distinct (mid, day) over entry pages
    entries = streams["page"].filter(F.col("page.last_page_id").isNull())
    expected = entries.select(
        F.col("common.mid").alias("mid"),
        F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd").alias("dt"),
    ).distinct()
    assert uv.count() == expected.count()


def test_user_jump_app(streams, spark):
    bounces = user_jump_app(streams["page"], "10 minutes")
    assert set(r["bounce_reason"] for r in bounces.select("bounce_reason").distinct().collect()) <= {
        "match",
        "timeout",
    }
    assert bounces.count() > 0
    # every bounce is an entry page
    n_entries = streams["page"].filter(F.col("page.last_page_id").isNull()).count()
    assert bounces.count() <= n_entries


def test_visitor_stats_app(streams, spark, ev_counts):
    from gmall_spark.operators.stateful import dedup_daily

    # the DWM uv stream in log shape: first entry page per (mid, day)
    page = streams["page"]
    entries = page.filter(F.col("page.last_page_id").isNull()).withColumn(
        "ts_ts", F.timestamp_millis(F.col("ts"))
    )
    uv_shaped = dedup_daily(entries, "common.mid", "ts_ts", "ts").drop("ts_ts", "dt")
    bounce_shaped = page.limit(0)  # exercised separately; union shape is what matters
    stats = visitor_stats_app(page, uv_shaped, bounce_shaped)
    sums = stats.agg(F.sum("pv_ct"), F.sum("uv_ct"), F.sum("uj_ct")).collect()[0]
    assert sums[0] == page.count()
    assert sums[1] == uv_shaped.count()
    assert sums[2] == 0


def test_product_stats_app(streams, spark, ev_counts):
    ps = product_stats_app(streams["page"], streams["display"])
    clicks = ps.agg(F.sum("click_ct")).collect()[0][0]
    displays = ps.agg(F.sum("display_ct")).collect()[0][0]
    assert clicks == ev_counts["view"]  # views map to good_detail+sku_id
    assert displays == 2 * ev_counts["purchase"]


def test_keyword_stats_app(streams, spark, ev_counts):
    kw = keyword_stats_app(streams["page"])
    # click events carry the 4-word query 'query spark fast table'
    total = kw.agg(F.sum("ct")).collect()[0][0]
    assert total == 4 * ev_counts["click"]
    assert set(r["keyword"] for r in kw.select("keyword").distinct().collect()) == {
        "query",
        "spark",
        "fast",
        "table",
    }


def test_payment_wide_app(spark):
    """Payment ⋈ order-wide within [0, 15 min] + bean merge (T9)."""
    from gmall_spark.apps.warehouse import payment_wide_app
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    ow = spark.createDataFrame(
        [(1, base, "u1", "BUILDING"), (2, base, "u2", "AUTO")],
        "okey long, o_ts timestamp, user string, segment string",
    )
    pays = spark.createDataFrame(
        [
            (100, 1, base + dt.timedelta(minutes=5), 9.99),   # in window
            (101, 2, base + dt.timedelta(minutes=20), 5.00),  # too late
            (102, 3, base + dt.timedelta(minutes=1), 1.00),   # no such order
        ],
        "pay_id long, okey long, pay_ts timestamp, pay_amount double",
    )
    out = payment_wide_app(pays, ow)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["okey"], r["pay_id"], r["user"], r["segment"]) == (1, 100, "u1", "BUILDING")


def test_visitor_stats_app_with_bounces(streams, spark):
    """uj_ct wired from real detected bounces (not an empty stream)."""
    from gmall_spark.apps.warehouse import user_jump_app, visitor_stats_app

    page = streams["page"]
    bounces = user_jump_app(page, "10 minutes")
    # reshape bounces back to log shape: semi-join page on (mid, ts)
    b = page.join(
        bounces.select(F.col("mid").alias("b_mid"), F.col("ts").alias("b_ts")),
        (F.col("common.mid") == F.col("b_mid")) & (page["ts"] == F.col("b_ts")),
        "left_semi",
    )
    stats = visitor_stats_app(page, page.limit(0), b)
    total_uj = stats.agg(F.sum("uj_ct")).collect()[0][0]
    assert total_uj == bounces.count()
