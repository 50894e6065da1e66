"""Composed streaming app topologies (SURVEY §3.1/§3.2): multi-operator
streaming queries — JSON parse → filter → UDTF-explode → windowed agg
(KeywordStatsApp) and stream-union → windowed agg (VisitorStatsApp) — each
equivalent to its batch twin modulo final-watermark stragglers."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall_spark.apps.fixtures import behavior_log_json
from gmall_spark.schemas import BEHAVIOR_LOG_SCHEMA
from gmall_spark.streaming.pipelines import run_to_memory, windowed_stats_stream

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def log_stream_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("log_json")
    behavior_log_json(spark, SF).coalesce(2).write.mode("overwrite").text(str(out))
    return str(out)


def _parse_stream(spark, path):
    schema = T.StructType(
        list(BEHAVIOR_LOG_SCHEMA.fields) + [T.StructField("event_id", T.LongType())]
    )
    raw = spark.readStream.option("maxFilesPerTrigger", "1").text(path)
    return raw.select(F.from_json("value", schema).alias("e")).select("e.*")


def test_keyword_stats_streaming_topology(spark, log_stream_dir):
    """KeywordStatsApp as ONE streaming query: parse → keyword filter →
    tokenize/explode (the UDTF shape) → watermarked windowed counts."""
    log = _parse_stream(spark, log_stream_dir)
    kw = (
        log.filter(
            (F.col("page.item_type") == "keyword") & F.col("page.item").isNotNull()
        )
        .select(
            F.explode(F.split(F.trim(F.col("page.item")), " ")).alias("keyword"),
            F.timestamp_millis("ts").alias("rt"),
        )
        .filter(F.col("keyword") != "")
    )
    stream = run_to_memory(
        windowed_stats_stream(kw, "rt", "10 minutes", ["keyword"], [F.count(F.lit(1)).alias("ct")]),
        "t_kw_stream",
    )
    # batch twin over the same parsed log
    from gmall_spark.apps.warehouse import base_log_app, keyword_stats_app

    batch = keyword_stats_app(base_log_app(behavior_log_json(spark, SF))["page"])
    s = {(r["stt"], r["keyword"], r["ct"]) for r in stream.collect()}
    b = {(r["stt"], r["keyword"], r["ct"]) for r in batch.collect()}
    assert s <= b
    missing = b - s
    max_ts = max(r[0] for r in b)
    for row in missing:  # only end-of-stream windows may be open
        assert row[0] == max_ts, row


def test_visitor_stats_streaming_union_topology(spark, log_stream_dir):
    """VisitorStatsApp's union-then-aggregate as one streaming query: three
    filtered projections of the stream unioned before the windowed agg."""
    log = _parse_stream(spark, log_stream_dir)
    dims = [F.col("common.vc").alias("vc"), F.col("common.ch").alias("ch")]
    pv = log.filter(F.col("page").isNotNull()).select(
        *dims, F.timestamp_millis("ts").alias("rt"), F.lit(1).alias("pv_ct"), F.lit(0).alias("sv_ct")
    )
    sv = log.filter(F.col("page").isNotNull() & F.col("page.last_page_id").isNull()).select(
        *dims, F.timestamp_millis("ts").alias("rt"), F.lit(0).alias("pv_ct"), F.lit(1).alias("sv_ct")
    )
    st = log.filter(F.col("start").isNotNull()).select(
        *dims, F.timestamp_millis("ts").alias("rt"), F.lit(0).alias("pv_ct"), F.lit(0).alias("sv_ct")
    )
    unioned = pv.unionByName(sv).unionByName(st)
    stream = run_to_memory(
        windowed_stats_stream(
            unioned, "rt", "60 minutes", ["vc", "ch"],
            [F.sum("pv_ct").alias("pv_ct"), F.sum("sv_ct").alias("sv_ct")],
        ),
        "t_vs_stream",
    )
    total_pv = stream.agg(F.sum("pv_ct")).collect()[0][0]
    total_sv = stream.agg(F.sum("sv_ct")).collect()[0][0]
    from gmall_spark.apps.warehouse import base_log_app

    out = base_log_app(behavior_log_json(spark, SF))
    n_page = out["page"].count()
    n_entry = out["page"].filter(F.col("page.last_page_id").isNull()).count()
    # stragglers only: within one open window of the batch totals
    assert total_pv is not None and total_pv <= n_page
    assert total_sv is not None and total_sv <= n_entry
    assert total_pv >= n_page * 0.9
    assert total_sv >= n_entry * 0.9


def test_decoupled_two_query_topology(spark, log_stream_dir, tmp_path):
    """The reference's core architectural fact (SURVEY §0): apps communicate
    only through a storage hop (Kafka topics there, files here). Query 1
    (BaseLogApp) writes the page stream; query 2 (UniqueVisitApp) consumes
    that OUTPUT as its source — two independent streaming queries, each with
    its own checkpoint, chained through storage."""
    from pyspark.sql import types as T
    from gmall_spark.streaming.pipelines import split_log_stream, run_to_memory
    from gmall_spark.streaming.stateful import dedup_daily_stream
    from gmall_spark.apps.warehouse import base_log_app, unique_visit_app

    hop = tmp_path / "hop"
    # query 1: split the log, page stream lands in the storage hop
    q1 = split_log_stream(
        spark.readStream.option("maxFilesPerTrigger", "1").text(log_stream_dir),
        str(hop),
        str(tmp_path / "ckpt1"),
    )
    q1.awaitTermination()

    # query 2: an independent streaming consumer of query 1's output
    page_schema = spark.read.json(str(hop / "page")).schema
    page_stream = (
        spark.readStream.schema(page_schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(hop / "page"))
        .select(
            F.col("ts").alias("ts_ms"),
            F.timestamp_millis("ts").alias("ts"),
            F.expr("CAST(substring(common.mid, 5, 10) AS LONG)").alias("user_id"),
            F.when(F.col("page.last_page_id").isNull(), "view").otherwise("other").alias("event_type"),
            F.col("ts").alias("event_id"),  # ms timestamp as tiebreak id

        )
        .filter(F.col("event_type") == "view")
        .drop("ts_ms")
    )
    uv = run_to_memory(dedup_daily_stream(page_stream), "t_hop_uv")
    # batch twin over the same chain
    batch_uv = unique_visit_app(base_log_app(behavior_log_json(spark, SF))["page"])
    assert uv.count() == batch_uv.count()
