"""Streaming order-wide: stream-stream interval join + per-micro-batch dim
refresh — a dim UPDATE between runs must be visible to subsequent batches
(the reference's Redis cache-invalidation semantics, without the cache)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gmall_spark.streaming.pipelines import order_wide_stream

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def write_orders(spark, path, rows):
    spark.createDataFrame(rows, "okey long, o_ts timestamp, user_id long").coalesce(
        1
    ).write.mode("append").parquet(path)


def write_details(spark, path, rows):
    spark.createDataFrame(rows, "okey long, d_ts timestamp, sku long").coalesce(
        1
    ).write.mode("append").parquet(path)


def write_dim(spark, path, rows):
    spark.createDataFrame(rows, "user_id long, user_name string").write.mode(
        "overwrite"
    ).parquet(path)


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("orders", "details", "dim", "out", "ckpt")}
    return d


def run(spark, dirs):
    orders_s = spark.readStream.schema("okey long, o_ts timestamp, user_id long").option(
        "maxFilesPerTrigger", "1"
    ).parquet(dirs["orders"])
    details_s = spark.readStream.schema("okey long, d_ts timestamp, sku long").option(
        "maxFilesPerTrigger", "1"
    ).parquet(dirs["details"])
    q = order_wide_stream(
        orders_s,
        details_s,
        {"user": (dirs["dim"], "user_id", "u_key")},
        dirs["out"],
        dirs["ckpt"],
    )
    q.awaitTermination()


def test_dim_update_visible_to_next_batch(spark, dirs):
    # dim v1
    spark.createDataFrame([(7, "alice_v1")], "u_key long, user_name string").write.mode(
        "overwrite"
    ).parquet(dirs["dim"])
    write_orders(spark, dirs["orders"], [(1, BASE, 7)])
    write_details(spark, dirs["details"], [(1, BASE + dt.timedelta(seconds=2), 55)])
    run(spark, dirs)
    out1 = spark.read.parquet(dirs["out"])
    assert out1.count() == 1
    assert out1.collect()[0]["user_name"] == "alice_v1"

    # dim UPDATE + new facts; checkpoint resume processes only the new files
    spark.createDataFrame([(7, "alice_v2")], "u_key long, user_name string").write.mode(
        "overwrite"
    ).parquet(dirs["dim"])
    write_orders(spark, dirs["orders"], [(2, BASE + dt.timedelta(minutes=1), 7)])
    write_details(
        spark, dirs["details"], [(2, BASE + dt.timedelta(minutes=1, seconds=1), 56)]
    )
    run(spark, dirs)
    out2 = spark.read.parquet(dirs["out"])
    assert out2.count() == 2
    names = {r["okey"]: r["user_name"] for r in out2.collect()}
    assert names[1] == "alice_v1"  # enriched when v1 was current
    assert names[2] == "alice_v2"  # new batch sees the updated dim
