"""The reference pipelines end-to-end (SURVEY §3), composed from operators.

Layer mapping (reference job → here):
  BaseLogApp      → base_log_app      (DWD: parse, repair, split)
  UniqueVisitApp  → unique_visit_app  (DWM: daily UV)
  UserJumpDetail  → user_jump_app     (DWM: bounce)
  OrderWideApp    → order_wide_app    (DWM: interval join + dim enrich)
  VisitorStatsApp → visitor_stats_app (DWS: unioned windowed stats)
  ProductStatsApp → product_stats_app (DWS: multi-stream product rollup)
  KeywordStatsApp → keyword_stats_app (DWS: tokenize + windowed counts)

Each takes DataFrames in and returns DataFrames out — no I/O inside, so the
same composition runs over batch tables, behavior-log JSON files, or Kafka
streams (sources/sinks are injected at the edge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gmall_spark.operators.joins import dim_enrich, interval_join
from gmall_spark.operators.parse import parse_json_with_dirty, split_log
from gmall_spark.operators.stateful import dedup_daily, detect_bounce, first_touch
from gmall_spark.operators.windows import tumbling_stats
from gmall_spark.schemas import BEHAVIOR_LOG_SCHEMA


def base_log_app(raw_json: DataFrame) -> dict[str, DataFrame]:
    """BaseLogApp.java end-to-end: try-parse with dirty side output (45-58) →
    keyed is_new repair (69-94) → start/display/page split (96-144).

    Returns {'dirty','start','page','display'} — the four output streams the
    reference writes to four Kafka topics.
    """
    from pyspark.sql import types as T

    log_schema = T.StructType(
        list(BEHAVIOR_LOG_SCHEMA.fields) + [T.StructField("event_id", T.LongType())]
    )
    clean, dirty = parse_json_with_dirty(raw_json, "value", log_schema)
    repaired = first_touch(clean, "common.mid", "ts", "event_id")
    repaired = repaired.withColumn(
        "common",
        F.col("common").withField(
            "is_new",
            F.when(
                (F.col("common.is_new") == "1") & (F.col("is_first") == 0), F.lit("0")
            ).otherwise(F.col("common.is_new")),
        ),
    ).drop("is_first")
    out = split_log(repaired)
    out["dirty"] = dirty
    return out


def unique_visit_app(page: DataFrame) -> DataFrame:
    """UniqueVisitApp.java: keep each mid's first page visit per day, only
    counting session entries (page.last_page_id null, line 68)."""
    entries = page.filter(F.col("page.last_page_id").isNull())
    entries = entries.withColumn("ts_ts", F.timestamp_millis(F.col("ts")))
    return dedup_daily(entries, "common.mid", "ts_ts", "ts").select(
        F.col("common.mid").alias("mid"),
        F.date_format("dt", "yyyy-MM-dd").alias("dt"),
        F.col("ts").alias("first_ts"),
    )


def user_jump_app(page: DataFrame, timeout: str = "10 seconds") -> DataFrame:
    """UserJumpDetailApp.java: CEP bounce — entry page followed by another
    entry within 10s (match) or by nothing (timeout), both emitted."""
    p = page.withColumn("ts_ts", F.timestamp_millis(F.col("ts")))
    return detect_bounce(
        p,
        "common.mid",
        "ts_ts",
        "ts",
        F.col("page.last_page_id").isNull(),
        timeout,
    ).select(F.col("common.mid").alias("mid"), F.col("ts").alias("ts"), "bounce_reason")


def order_wide_app(
    orders: DataFrame,
    details: DataFrame,
    dims: list[tuple[DataFrame, str, str]],
) -> DataFrame:
    """OrderWideApp.java: interval join (±window) + chained broadcast dim
    enrichment — the reference's async-Phoenix/Redis machinery replaced by
    Catalyst broadcast joins (SURVEY §3.3)."""
    joined = interval_join(
        orders, details, on="okey", left_ts="o_ts", right_ts="d_ts",
        lower="-5 seconds", upper="5 seconds",
    )
    return dim_enrich(joined, dims)


def payment_wide_app(payments: DataFrame, order_wide: DataFrame) -> DataFrame:
    """PaymentWideApp.java: payment ⋈ order_wide on order_id within the
    intended [-15 min, 0] window (SURVEY §6a.2 — the reference's literal
    -15 ms lookback is a bug), then the T9 bean-merge: payment fields win,
    order fields fill the rest, null-coalescing like
    PaymentWide.mergeOtherOrderWide (bean/PaymentWide.java:56-86).

    Expects `payments(pay_id, okey, pay_ts, pay_amount, user_id?)` and
    `order_wide(okey, o_ts, ...)`; emits one row per matched payment.
    """
    joined = interval_join(
        order_wide, payments, on="okey", left_ts="o_ts", right_ts="pay_ts",
        lower="0 seconds", upper="15 minutes",
    )
    overlap = set(payments.columns) & set(order_wide.columns) - {"okey"}
    # bean merge: names in BOTH schemas resolve to ONE column, payment value
    # winning and the order side filling nulls (PaymentWide.mergeOtherOrderWide)
    merged_cols = [
        (F.coalesce(F.col(f"r.{c}"), F.col(f"l.{c}")) if c in overlap else F.col(f"r.{c}")).alias(c)
        for c in payments.columns
        if c != "okey"
    ]
    order_cols = [
        F.col(f"l.{c}").alias(c)
        for c in order_wide.columns
        if c != "okey" and c not in overlap
    ]
    return joined.select(F.col("l.okey").alias("okey"), *merged_cols, *order_cols)


def visitor_stats_app(
    page: DataFrame, uv: DataFrame, bounce: DataFrame, window: str = "10 minutes"
) -> DataFrame:
    """VisitorStatsApp.java: union three DWM streams into one keyed stats
    record per (vc, ch, ar, is_new) per window — the 'union is a fullJoin'
    pattern (lines 39-41), then tumbling aggregate (132-165)."""
    dims = [
        F.col("common.vc").alias("vc"),
        F.col("common.ch").alias("ch"),
        F.col("common.ar").alias("ar"),
        F.col("common.is_new").alias("is_new"),
    ]
    pv = page.select(
        *dims,
        F.timestamp_millis("ts").alias("rt"),
        F.lit(1).alias("pv_ct"),
        F.when(F.col("page.last_page_id").isNull(), 1).otherwise(0).alias("sv_ct"),
        F.coalesce(F.col("page.during_time"), F.lit(0)).alias("dur_sum"),
        F.lit(0).alias("uv_ct"),
        F.lit(0).alias("uj_ct"),
    )
    uvs = uv.select(
        *dims,
        F.timestamp_millis("ts").alias("rt"),
        F.lit(0).alias("pv_ct"),
        F.lit(0).alias("sv_ct"),
        F.lit(0).cast("long").alias("dur_sum"),
        F.lit(1).alias("uv_ct"),
        F.lit(0).alias("uj_ct"),
    )
    uj = bounce.select(
        *dims,
        F.timestamp_millis("ts").alias("rt"),
        F.lit(0).alias("pv_ct"),
        F.lit(0).alias("sv_ct"),
        F.lit(0).cast("long").alias("dur_sum"),
        F.lit(0).alias("uv_ct"),
        F.lit(1).alias("uj_ct"),
    )
    unioned = pv.unionByName(uvs).unionByName(uj)
    return tumbling_stats(
        unioned,
        "rt",
        window,
        ["vc", "ch", "ar", "is_new"],
        [
            F.sum("pv_ct").alias("pv_ct"),
            F.sum("sv_ct").alias("sv_ct"),
            F.sum("uv_ct").alias("uv_ct"),
            F.sum("uj_ct").alias("uj_ct"),
            F.sum("dur_sum").alias("dur_sum"),
        ],
    )


def product_stats_app(page: DataFrame, display: DataFrame, window: str = "10 minutes") -> DataFrame:
    """ProductStatsApp.java:78-118 (T5 flatMap): click events = good_detail
    pages with item_type sku_id; display exposure = one event per displays[]
    element; union then per-sku windowed counts (243-284)."""
    clicks = page.filter(
        (F.col("page.page_id") == "good_detail") & (F.col("page.item_type") == "sku_id")
    ).select(
        F.col("page.item").alias("sku_id"),
        F.timestamp_millis("ts").alias("rt"),
        F.lit(1).alias("click_ct"),
        F.lit(0).alias("display_ct"),
    )
    exposures = display.filter(F.col("display.item_type") == "sku_id").select(
        F.col("display.item").alias("sku_id"),
        F.timestamp_millis("ts").alias("rt"),
        F.lit(0).alias("click_ct"),
        F.lit(1).alias("display_ct"),
    )
    unioned = clicks.unionByName(exposures)
    return tumbling_stats(
        unioned,
        "rt",
        window,
        ["sku_id"],
        [F.sum("click_ct").alias("click_ct"), F.sum("display_ct").alias("display_ct")],
    )


def keyword_stats_app(
    page: DataFrame, window: str = "10 minutes", segment_cjk: bool = False
) -> DataFrame:
    """KeywordStatsApp.java: filter keyword searches (38-42), tokenize+explode
    (46-47, the UDTF as split+explode), windowed counts (50-59).

    segment_cjk=True routes the tokenizer through the pluggable CJK segmenter
    (extras.text.tokenize_udf: jieba → dictionary FMM — the reference's IK
    smart mode, KeywordUtil.java:16-35); the default stays whitespace, which
    is identical on ASCII input and exactly reproducible in SQL oracles."""
    if segment_cjk:
        from gmall_spark.extras.text import tokenize_udf

        token_arr = tokenize_udf(F.trim(F.col("page.item")))
    else:
        token_arr = F.split(F.trim(F.col("page.item")), " ")
    kw = page.filter(
        (F.col("page.item_type") == "keyword") & F.col("page.item").isNotNull()
    ).select(
        F.explode(token_arr).alias("keyword"),
        F.timestamp_millis("ts").alias("rt"),
    ).filter(F.col("keyword") != "")
    return tumbling_stats(
        kw, "rt", window, ["keyword"], [F.count(F.lit(1)).alias("ct")]
    ).withColumn("source", F.lit("SEARCH"))
