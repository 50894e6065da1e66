"""Live-config CDC routing (J4/K2): a config change between runs applies to
subsequent micro-batches only, and checkpoint resume processes exactly the
new files — the reference's broadcast-config semantics on Spark."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from gmall_spark.schemas import TABLE_PROCESS_SCHEMA
from gmall_spark.streaming.pipelines import route_cdc_stream


def envelope(table: str, op: str, rid: int) -> str:
    return json.dumps(
        {
            "database": "gmall",
            "tableName": table,
            "data": {"id": str(rid), "total": f"{rid}.00", "status": "OK"},
            "before": {},
            "type": op,
        }
    )


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "in": tmp_path / "in",
        "cfg": tmp_path / "cfg",
        "out": tmp_path / "out",
        "ckpt": tmp_path / "ckpt",
    }
    for v in d.values():
        v.mkdir()
    return {k: str(v) for k, v in d.items()}


def write_config(spark, path: str, sink_table: str, cols: str) -> None:
    spark.createDataFrame(
        [("orders", "insert", "kafka", sink_table, cols, "id", None)],
        TABLE_PROCESS_SCHEMA,
    ).write.mode("overwrite").parquet(path)


def run_stream(spark, dirs):
    stream = (
        spark.readStream.option("maxFilesPerTrigger", "1").text(dirs["in"])
    )  # raw lines in column `value` — the Kafka value-column shape
    q = route_cdc_stream(stream, dirs["cfg"], dirs["out"], dirs["ckpt"])
    q.awaitTermination()


def test_config_reload_and_checkpoint_resume(spark, dirs):
    import pathlib

    # run 1: config routes inserts to topic_v1 keeping id+total
    write_config(spark, dirs["cfg"], "topic_v1", "id,total")
    pathlib.Path(dirs["in"], "b1.json").write_text(
        "\n".join(envelope("orders", "insert", i) for i in range(5))
        + "\n"
        + envelope("orders", "delete", 99)
    )
    run_stream(spark, dirs)
    out1 = spark.read.parquet(dirs["out"])
    assert out1.count() == 5  # delete dropped
    assert set(r["sink_table"] for r in out1.select("sink_table").distinct().collect()) == {
        "topic_v1"
    }
    # column pruning per config: status excluded
    assert out1.filter(F.element_at("data", "status").isNotNull()).count() == 0

    # run 2: config now routes to topic_v2 and keeps status; only the NEW
    # file is processed (checkpoint resume), under the NEW rules
    write_config(spark, dirs["cfg"], "topic_v2", "id,status")
    pathlib.Path(dirs["in"], "b2.json").write_text(
        "\n".join(envelope("orders", "insert", i) for i in range(100, 103))
    )
    run_stream(spark, dirs)
    out2 = spark.read.parquet(dirs["out"])
    assert out2.count() == 8  # 5 old + 3 new, old rows NOT reprocessed
    v2 = out2.filter(F.col("sink_table") == "topic_v2")
    assert v2.count() == 3
    assert v2.filter(F.element_at("data", "status") == "OK").count() == 3
    assert v2.filter(F.element_at("data", "total").isNotNull()).count() == 0


def test_split_log_stream_multi_sink(spark, tmp_path):
    """One streaming pass → four sinks (T6). Counts must match the batch
    split exactly (note: the is_new repair inside this wrapper is per-batch;
    cross-batch repair is fix_is_new_stream's job)."""
    from gmall_spark.apps.fixtures import behavior_log_json
    from gmall_spark.apps.warehouse import base_log_app
    from gmall_spark.streaming.pipelines import split_log_stream

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    raw = behavior_log_json(spark, "/root/testdata/sf0.001")
    raw.coalesce(1).write.mode("overwrite").text(str(src))

    stream = spark.readStream.text(str(src))
    q = split_log_stream(stream, str(out), str(ckpt))
    q.awaitTermination()

    batch_out = base_log_app(raw)
    for name in ("start", "page", "display"):
        got = spark.read.json(str(out / name)).count()
        assert got == batch_out[name].count(), name
    import os

    assert not os.path.exists(out / "dirty") or spark.read.json(
        str(out / "dirty")
    ).count() == 0


def test_socket_source_end_to_end(spark):
    """S5 — the reference's socket-fed demos (TestFlinkSQLJoin.java:20-29):
    a real TCP server feeds a socket stream into the CDC decode path."""
    import json
    import socket
    import socketserver
    import threading
    import time

    lines = [
        json.dumps(
            {"database": "g", "tableName": "orders", "data": {"id": str(i)},
             "before": {}, "type": "insert"}
        )
        for i in range(20)
    ]

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            self.request.sendall(("\n".join(lines) + "\n").encode())
            time.sleep(30)  # keep the connection open while Spark reads

    server = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    server.daemon_threads = True
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        from gmall_spark.operators.parse import decode_cdc

        raw = (
            spark.readStream.format("socket")
            .option("host", "127.0.0.1")
            .option("port", str(port))
            .load()
        )
        decoded = decode_cdc(raw)
        q = (
            decoded.writeStream.format("memory")
            .queryName("t_socket")
            .outputMode("append")
            .start()
        )
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.table("t_socket").count() >= len(lines):
                break
            time.sleep(0.5)
        q.stop()
        out = spark.table("t_socket")
        assert out.count() == len(lines)
        assert out.filter(F.col("type") == "insert").count() == len(lines)
    finally:
        server.shutdown()


def test_kafka_wrappers_fail_only_at_classpath_boundary(spark, tmp_path):
    """ENV WAIVER (S1/K1/K2): no Kafka broker or spark-sql-kafka jar ships in
    this container, so the Kafka integrations cannot be driven end-to-end
    here. This contract test pins the wrappers' behavior up to that
    boundary: they must reach Spark's DataSource loader with format
    'kafka' (options wired, no earlier Python error) and fail ONLY with the
    missing-data-source error. On a cluster with the standard
    spark-sql-kafka-0-10 package, the same code resolves and runs —
    the routing/serialization logic they wrap is covered broker-free by the
    file-stream twins in this suite."""
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    from gmall_spark.streaming.pipelines import kafka_dynamic_topic_sink, kafka_stream

    with pytest.raises(AnalysisException, match="kafka"):
        kafka_stream(spark, "broker:9092", "ods_base_log", "g1")

    routed = spark.readStream.format("rate").option("rowsPerSecond", 1).load().selectExpr(
        "'dwd_order_insert' AS sink_table", "CAST(value AS STRING) AS payload"
    )
    with pytest.raises(AnalysisException, match="kafka"):
        kafka_dynamic_topic_sink(routed, "broker:9092", str(tmp_path / "ckpt"))


def test_table_dir_resolves_relative_sf_dir(tmp_path):
    """A relative sf_dir must not produce a symlink whose relative target
    resolves against /tmp (a silently-empty stream source — the failure was
    0 rows with no error)."""
    import os

    from gmall_spark.streaming.pipelines import _table_dir

    os.makedirs(tmp_path / "sfx", exist_ok=True)
    (tmp_path / "sfx" / "events.parquet").write_bytes(b"")
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        d = _table_dir("sfx", "events")
        link = os.path.join(d, "events.parquet")
        assert os.path.isabs(os.readlink(link))
        assert os.path.exists(link)  # target resolves
    finally:
        os.chdir(cwd)


def test_kafka_end_to_end_when_broker_available(tmp_path):
    """Self-retiring ENV WAIVER (S1/K1/K2): when a broker AND the
    spark-sql-kafka package are available, prove the wrappers end-to-end —
    produce a fixed topic (K1), consume it (S1), route rows to
    per-record dynamic topics (K2), and read those back. Gated on
    SPARK_GRAFT_KAFKA=host:port; skipped with that reason otherwise, so the
    waiver disappears automatically the day the driver image ships a broker.

    Uses its own session so the kafka package jar can be added via
    spark.jars.packages (a getOrCreate'd session can't change its
    classpath)."""
    import os
    import uuid

    import pytest

    brokers = os.environ.get("SPARK_GRAFT_KAFKA")
    if not brokers:
        pytest.skip("SPARK_GRAFT_KAFKA not set (no broker in this environment)")

    from pyspark.sql import SparkSession

    import pyspark

    pkg = f"org.apache.spark:spark-sql-kafka-0-10_2.13:{pyspark.__version__}"
    session = (
        SparkSession.builder.master("local[4]")
        .appName("kafka_e2e")
        .config("spark.jars.packages", pkg)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    try:
        from gmall_spark.streaming.pipelines import (
            kafka_dynamic_topic_sink,
            kafka_stream,
        )

        run = uuid.uuid4().hex[:8]
        src_topic = f"gmall_e2e_src_{run}"

        # K1: fixed-topic produce (batch write — same sink path)
        rows = session.createDataFrame(
            [(f"k{i}", f'{{"id": {i}, "sink_table": "dwd_t{i % 2}_{run}"}}') for i in range(20)],
            "key string, value string",
        )
        (
            rows.write.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("topic", src_topic)
            .save()
        )

        # S1: consume; K2: dynamic-topic routing from the payload column
        consumed = kafka_stream(session, brokers, src_topic, f"g_{run}")
        routed = consumed.selectExpr(
            "get_json_object(value, '$.sink_table') AS sink_table",
            "get_json_object(value, '$.id') AS id",
        )
        q = kafka_dynamic_topic_sink(routed, brokers, str(tmp_path / "ckpt"))
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        back = (
            session.read.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("subscribe", f"dwd_t0_{run},dwd_t1_{run}")
            .option("startingOffsets", "earliest")
            .load()
        )
        assert back.count() == 20
        per_topic = {r["topic"]: r["ct"] for r in back.groupBy("topic").count().withColumnRenamed("count", "ct").collect()}
        assert per_topic == {f"dwd_t0_{run}": 10, f"dwd_t1_{run}": 10}
    finally:
        session.stop()


def test_mysql_cdc_end_to_end_when_db_available(tmp_path):
    """Self-retiring ENV WAIVER (S2/S4/K3-mysql): the Debezium-side twin of
    the Kafka smoke above. When a real MySQL is reachable, prove the
    JDBC-facing surfaces against it end-to-end — write_jdbc (K3) into a
    fresh table, parallel ranged read back, then run the Debezium envelope
    decode (S2: decode_cdc + drop_cdc_deletes) over insert envelopes built
    from the rows THAT round-tripped the real database, asserting the
    decode reproduces them exactly. Gated on SPARK_GRAFT_MYSQL=<jdbc url
    with credentials>; skipped with that reason otherwise, so the waiver
    disappears automatically the day the driver image ships a MySQL. (A
    live binlog→Debezium→Kafka pipeline additionally needs a Connect
    cluster; when one exists, point the Kafka smoke's dynamic-topic consumer
    at its topic — the decode path exercised here is byte-identical.)

    Own session so the connector jar can come via spark.jars.packages."""
    import json
    import os
    import uuid

    import pytest

    url = os.environ.get("SPARK_GRAFT_MYSQL")
    if not url:
        pytest.skip("SPARK_GRAFT_MYSQL not set (no MySQL in this environment)")

    from pyspark.sql import SparkSession

    session = (
        SparkSession.builder.master("local[4]")
        .appName("mysql_e2e")
        .config("spark.jars.packages", "com.mysql:mysql-connector-j:8.4.0")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    try:
        from gmall_spark.operators.parse import decode_cdc, drop_cdc_deletes
        from gmall_spark.sinks.batch import write_jdbc

        run = uuid.uuid4().hex[:8]
        table = f"gmall_e2e_{run}"
        rows = session.createDataFrame(
            [(i, f"sku_{i}", (i * 7) % 100) for i in range(20)],
            "id bigint, sku string, qty bigint",
        )
        write_jdbc(rows, url, table)

        back = (
            session.read.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .option("partitionColumn", "id")
            .option("lowerBound", "0")
            .option("upperBound", "20")
            .option("numPartitions", "4")
            .load()
        )
        got = sorted((r.id, r.sku, r.qty) for r in back.collect())
        assert got == sorted((i, f"sku_{i}", (i * 7) % 100) for i in range(20))

        # Debezium insert envelopes for the rows that traversed the real DB
        envelopes = session.createDataFrame(
            [
                (
                    json.dumps(
                        {
                            "database": "gmall",
                            "tableName": table,
                            "type": "c",
                            "data": {"id": r.id, "sku": r.sku, "qty": r.qty},
                        }
                    ),
                )
                for r in back.collect()
            ],
            "value string",
        )
        decoded = drop_cdc_deletes(decode_cdc(envelopes))
        out = sorted(
            (int(r.data["id"]), r.data["sku"], int(r.data["qty"]))
            for r in decoded.collect()
        )
        assert out == got
        assert decoded.filter(decoded.type != "insert").count() == 0
    finally:
        session.stop()
