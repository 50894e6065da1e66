"""All StructTypes of the reference data model (SURVEY §1.3).

The reference keeps schemas dynamic (fastjson ``JSONObject``) at the edges and
fixed (Lombok beans / SQL DDL) in the core; in Spark everything gets an
explicit StructType so Catalyst can prune nested fields down to the scan.

Reference provenance is cited per schema (paths relative to /root/reference/).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Behavior log (BaseLogApp input), field usage:
# gmall-realtime/src/main/java/com/aron/app/dwd/BaseLogApp.java:64-133
# ---------------------------------------------------------------------------
COMMON_SCHEMA = T.StructType(
    [
        T.StructField("mid", T.StringType()),
        T.StructField("uid", T.StringType()),
        T.StructField("vc", T.StringType()),
        T.StructField("ch", T.StringType()),
        T.StructField("ar", T.StringType()),
        T.StructField("ba", T.StringType()),
        T.StructField("md", T.StringType()),
        T.StructField("os", T.StringType()),
        T.StructField("is_new", T.StringType()),
    ]
)

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("page_id", T.StringType()),
        T.StructField("last_page_id", T.StringType()),
        T.StructField("item", T.StringType()),
        T.StructField("item_type", T.StringType()),
        T.StructField("during_time", T.LongType()),
        T.StructField("source_type", T.StringType()),
    ]
)

DISPLAY_SCHEMA = T.StructType(
    [
        T.StructField("item", T.StringType()),
        T.StructField("item_type", T.StringType()),
        T.StructField("display_type", T.StringType()),
        T.StructField("order", T.LongType()),
        T.StructField("pos_id", T.LongType()),
    ]
)

START_SCHEMA = T.StructType(
    [
        T.StructField("entry", T.StringType()),
        T.StructField("open_ad_id", T.LongType()),
        T.StructField("loading_time", T.LongType()),
        T.StructField("open_ad_ms", T.LongType()),
        T.StructField("open_ad_skip_ms", T.LongType()),
    ]
)

BEHAVIOR_LOG_SCHEMA = T.StructType(
    [
        T.StructField("common", COMMON_SCHEMA),
        T.StructField("page", PAGE_SCHEMA),
        T.StructField("displays", T.ArrayType(DISPLAY_SCHEMA)),
        T.StructField("start", START_SCHEMA),
        T.StructField("err", T.StructType([T.StructField("error_code", T.LongType())])),
        T.StructField("ts", T.LongType()),  # epoch millis
    ]
)

# ---------------------------------------------------------------------------
# CDC envelope — the Debezium-deserialized change record:
# gmall-realtime/src/main/java/com/aron/app/func/MyStringDeserializationSchema.java:17-85
# ---------------------------------------------------------------------------
CDC_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("database", T.StringType()),
        T.StructField("tableName", T.StringType()),
        T.StructField("data", T.MapType(T.StringType(), T.StringType())),
        T.StructField("before", T.MapType(T.StringType(), T.StringType())),
        T.StructField("type", T.StringType()),  # insert | update | delete
    ]
)

# ---------------------------------------------------------------------------
# Routing config table_process:
# gmall-realtime/src/main/java/com/aron/bean/TableProcess.java:6-25
# ---------------------------------------------------------------------------
TABLE_PROCESS_SCHEMA = T.StructType(
    [
        T.StructField("source_table", T.StringType()),
        T.StructField("operate_type", T.StringType()),  # insert | update | delete
        T.StructField("sink_type", T.StringType()),  # kafka | hbase | clickhouse
        T.StructField("sink_table", T.StringType()),
        T.StructField("sink_columns", T.StringType()),  # comma-separated whitelist
        T.StructField("sink_pk", T.StringType()),
        T.StructField("sink_extend", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Business beans (money = DecimalType(16,2) per BigDecimal fields,
# gmall-realtime/src/main/java/com/aron/bean/OrderInfo.java:7-23, OrderDetail.java:7-19,
# PaymentInfo.java:8-17)
# ---------------------------------------------------------------------------
MONEY = T.DecimalType(16, 2)

ORDER_INFO_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("province_id", T.LongType()),
        T.StructField("order_status", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("total_amount", MONEY),
        T.StructField("activity_reduce_amount", MONEY),
        T.StructField("coupon_reduce_amount", MONEY),
        T.StructField("original_total_amount", MONEY),
        T.StructField("feight_fee", MONEY),
        T.StructField("expire_time", T.StringType()),
        T.StructField("create_time", T.StringType()),
        T.StructField("operate_time", T.StringType()),
    ]
)

ORDER_DETAIL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("order_id", T.LongType()),
        T.StructField("sku_id", T.LongType()),
        T.StructField("order_price", MONEY),
        T.StructField("sku_num", T.LongType()),
        T.StructField("sku_name", T.StringType()),
        T.StructField("create_time", T.StringType()),
        T.StructField("split_total_amount", MONEY),
        T.StructField("split_activity_amount", MONEY),
        T.StructField("split_coupon_amount", MONEY),
    ]
)

PAYMENT_INFO_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("order_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("total_amount", MONEY),
        T.StructField("subject", T.StringType()),
        T.StructField("payment_type", T.StringType()),
        T.StructField("create_time", T.StringType()),
        T.StructField("callback_time", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# DWS output beans (oracle targets), bean/VisitorStats.java:11-36,
# ProductStats.java:20-86, KeywordStats.java:13-20, ProvinceStats.java:16-28
# ---------------------------------------------------------------------------
VISITOR_STATS_SCHEMA = T.StructType(
    [
        T.StructField("stt", T.StringType()),
        T.StructField("edt", T.StringType()),
        T.StructField("vc", T.StringType()),
        T.StructField("ch", T.StringType()),
        T.StructField("ar", T.StringType()),
        T.StructField("is_new", T.StringType()),
        T.StructField("uv_ct", T.LongType()),
        T.StructField("pv_ct", T.LongType()),
        T.StructField("sv_ct", T.LongType()),
        T.StructField("uj_ct", T.LongType()),
        T.StructField("dur_sum", T.LongType()),
        T.StructField("ts", T.LongType()),
    ]
)

KEYWORD_STATS_SCHEMA = T.StructType(
    [
        T.StructField("keyword", T.StringType()),
        T.StructField("ct", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("stt", T.StringType()),
        T.StructField("edt", T.StringType()),
        T.StructField("ts", T.LongType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata schemas (TESTDATA.md) — explicit so streaming file sources
# (which cannot infer) and tests share one source of truth.
# ---------------------------------------------------------------------------
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Multimodal asset column convention (extras): opaque binary payload + typed
# metadata, decoded only inside Arrow-batched UDFs.
MEDIA_ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)
