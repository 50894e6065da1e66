"""Deterministic behavior-log synthesis from the driver's events table.

The reference consumes app-log JSON (FIXTURES.md §1); the driver testdata has
no such table, so the apps' end-to-end tests derive one from `events`,
deterministically (pure column expressions, no RNG):

  event_type → page routing   view → 'good_detail' entry page (last_page_id
  null ⇒ session entry), click → 'home', purchase → 'payment' (+displays),
  signup → a start (launch) record, error → err record.
  props.$.k → is_new noise    k % 7 == 0 ⇒ claims is_new="1" (wrongly for
  returning visitors — exactly the repair case BaseLogApp.java:69-94 fixes).
  value → during_time millis. user_id → mid. ts → epoch millis.

This keeps every app testable end-to-end (JSON in, stats out) on driver data
without inventing new inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_spark.sources import load_table


def behavior_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed behavior-log DataFrame (common/page/displays/start/ts)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    is_start = F.col("event_type") == "signup"
    page_id = (
        F.when(F.col("event_type") == "view", F.lit("good_detail"))
        .when(F.col("event_type") == "click", F.lit("home"))
        .when(F.col("event_type") == "purchase", F.lit("payment"))
        .otherwise(F.lit("other"))
    )
    common = F.struct(
        F.concat(F.lit("mid_"), F.col("user_id")).alias("mid"),
        F.col("user_id").cast("string").alias("uid"),
        F.concat(F.lit("v"), (k % 3).cast("string")).alias("vc"),
        F.element_at(F.array(F.lit("appstore"), F.lit("huawei"), F.lit("xiaomi")), (k % 3 + 1).cast("int")).alias("ch"),
        F.concat(F.lit("ar_"), (k % 5).cast("string")).alias("ar"),
        F.lit("iPhone").alias("ba"),
        F.lit("iPhone13").alias("md"),
        F.lit("ios").alias("os"),
        F.when(k % 7 == 0, F.lit("1")).otherwise(F.lit("0")).alias("is_new"),
    )
    page = F.when(
        ~is_start,
        F.struct(
            page_id.alias("page_id"),
            F.when(F.col("event_type") == "view", F.lit(None).cast("string"))
            .otherwise(F.lit("home"))
            .alias("last_page_id"),
            F.when(F.col("event_type") == "view", F.concat(F.lit("sku_"), k % 100))
            .when(F.col("event_type") == "click", F.lit("query spark fast table"))
            .otherwise(F.lit(None).cast("string"))
            .alias("item"),
            F.when(F.col("event_type") == "view", F.lit("sku_id"))
            .when(F.col("event_type") == "click", F.lit("keyword"))
            .otherwise(F.lit(None).cast("string"))
            .alias("item_type"),
            (F.col("value") * 100).cast("long").alias("during_time"),
            F.lit("promotion").alias("source_type"),
        ),
    )
    displays = F.when(
        F.col("event_type") == "purchase",
        F.array(
            F.struct(
                F.concat(F.lit("sku_"), k % 100).alias("item"),
                F.lit("sku_id").alias("item_type"),
                F.lit("promotion").alias("display_type"),
                F.lit(1).cast("long").alias("order"),
                F.lit(1).cast("long").alias("pos_id"),
            ),
            F.struct(
                F.concat(F.lit("sku_"), (k + 1) % 100).alias("item"),
                F.lit("sku_id").alias("item_type"),
                F.lit("query").alias("display_type"),
                F.lit(2).cast("long").alias("order"),
                F.lit(1).cast("long").alias("pos_id"),
            ),
        ),
    )
    start = F.when(
        is_start,
        F.struct(
            F.lit("icon").alias("entry"),
            (k % 10).cast("long").alias("open_ad_id"),
            F.lit(1000).cast("long").alias("loading_time"),
            F.lit(500).cast("long").alias("open_ad_ms"),
            F.lit(None).cast("long").alias("open_ad_skip_ms"),
        ),
    )
    err = F.when(
        F.col("event_type") == "error",
        F.struct((k % 4 + 3001).cast("long").alias("error_code")),
    )
    return ev.select(
        common.alias("common"),
        page.alias("page"),
        displays.alias("displays"),
        start.alias("start"),
        err.alias("err"),
        (F.col("ts").cast("double") * 1000).cast("long").alias("ts"),
        F.col("event_id"),
    )


def behavior_log_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The log as JSON strings — the shape BaseLogApp actually ingests from
    Kafka (value column), for driving the parse path end-to-end."""
    log = behavior_log(spark, sf_dir)
    return log.select(
        F.to_json(F.struct("common", "page", "displays", "start", "err", "ts", "event_id")).alias(
            "value"
        )
    )
