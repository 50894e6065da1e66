"""K3 — the JDBC batched sink (ClickhouseUtil.java:16-66) driven for real
against embedded Derby (on Spark's classpath): batch write with transient-
column drop, and the streaming foreachBatch variant with checkpointed
exactly-once-per-batch appends."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmall_spark.sinks import write_jdbc
from gmall_spark.sources import load_table

SF = "/root/testdata/sf0.001"
DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


def read_table(spark, url, table):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DRIVER)
        .load()
    )


def test_write_jdbc_drops_transient_columns(spark, derby_url):
    stats = (
        load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("ct"))
        .withColumn("debug_blob", F.lit("transient-not-for-sink"))
    )
    write_jdbc(stats, derby_url, "visitor_stats", transient_cols=["debug_blob"], driver=DRIVER)
    back = read_table(spark, derby_url, "visitor_stats")
    assert back.count() == stats.count()
    assert set(c.lower() for c in back.columns) == {"event_type", "ct"}


def test_foreach_batch_jdbc_streaming(spark, derby_url, tmp_path):
    from gmall_spark.streaming.pipelines import foreach_batch_jdbc

    # seed the table so appends have a schema to land in
    first = spark.createDataFrame([("seed", 0)], "event_type string, ct long")
    write_jdbc(first, derby_url, "stream_stats", driver=DRIVER)

    src = tmp_path / "src"
    src.mkdir()
    load_table(spark, SF, "events").select("event_type").coalesce(2).write.mode(
        "overwrite"
    ).parquet(str(src))
    stream = (
        spark.readStream.schema("event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    agg_free = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("ct"))
    # complete-mode agg can't foreachBatch-append idempotently; write the raw
    # per-batch counts instead (the reference's per-batch JDBC INSERT shape)
    q = foreach_batch_jdbc(
        stream.withColumn("ct", F.lit(1).cast("long")),
        derby_url,
        "stream_stats",
        str(tmp_path / "ckpt"),
        driver=DRIVER,
    )
    q.awaitTermination()
    back = read_table(spark, derby_url, "stream_stats")
    n_events = load_table(spark, SF, "events").count()
    assert back.count() == n_events + 1  # all rows + the seed
