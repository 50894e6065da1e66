"""Unit tests for the shared column helpers (SURVEY §2.8 expressions)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from gmall_spark.functions import age_from_birthday, date_hour, epoch_millis, shingles, tokens


def test_date_hour_split(spark):
    df = spark.createDataFrame([("2024-03-05 14:22:33",)], "create_time string")
    d, h = date_hour(F.col("create_time"))
    row = df.select(d.alias("d"), h.alias("h")).collect()[0]
    assert row["d"] == "2024-03-05"
    assert row["h"] == "14"


def test_epoch_millis_roundtrip(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 0, 0, 1, 500000),)], "ts timestamp"
    )
    ms = df.select(epoch_millis(F.col("ts")).alias("ms")).collect()[0]["ms"]
    assert ms == 1704067201500


def test_age_from_birthday(spark):
    df = spark.createDataFrame([("1990-01-01",)], "birthday string")
    age = df.select(age_from_birthday(F.to_date("birthday")).alias("a")).collect()[0]["a"]
    assert 30 <= age <= 45  # sane regardless of current date


def test_shingles_short_input(spark):
    df = spark.createDataFrame([("a b",), ("a b c d",)], "t string")
    out = df.select(shingles(tokens("t"), 3).alias("s")).collect()
    assert out[0]["s"] == ["a b"]  # clamped prefix for size < k
    assert out[1]["s"] == ["a b c", "b c d"]
