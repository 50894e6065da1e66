"""The `gmall_logs` Python DataSource: batch read with filename-day filter
pushdown (whole-file pruning a built-in reader can't do), and the streaming
offset protocol (file-count offsets over sorted names)."""

import json

import pytest
from pyspark.sql import functions as F

from gmall_spark.sources.logsource import (
    GmallLogsReader,
    register_log_source,
)


@pytest.fixture()
def logdir(tmp_path):
    days = {
        "2024-01-01": [{"common": {"mid": "m1"}, "ts": 1}, {"common": {"mid": "m2"}, "ts": 2}],
        "2024-01-02": [{"common": {"mid": "m3"}, "ts": 3}],
        "2024-01-03": [{"common": {"mid": "m4"}, "ts": 4}],
    }
    for day, rows in days.items():
        (tmp_path / f"log-{day}.jsonl").write_text(
            "\n".join(json.dumps(r) for r in rows) + "\n"
        )
    return str(tmp_path)


def test_batch_read_all(spark, logdir):
    register_log_source(spark)
    df = spark.read.format("gmall_logs").load(logdir)
    assert df.columns == ["line", "src_file", "day"]
    assert df.count() == 4
    assert df.select("day").distinct().count() == 3


def test_day_filter_prunes_files_at_planning(spark, logdir):
    register_log_source(spark)
    df = spark.read.format("gmall_logs").load(logdir).filter(F.col("day") == "2024-01-01")
    assert df.count() == 2
    # the pruning is visible at the reader level: only matching files
    # become partitions (planning-time, not row-filter-time)
    rdr = GmallLogsReader({"path": logdir})
    from pyspark.sql.datasource import EqualTo, In

    leftover = list(rdr.pushFilters([EqualTo(("day",), "2024-01-01")]))
    assert leftover == []  # fully consumed
    assert len(rdr.partitions()) == 1
    rdr2 = GmallLogsReader({"path": logdir})
    list(rdr2.pushFilters([In(("day",), ("2024-01-01", "2024-01-03"))]))
    assert len(rdr2.partitions()) == 2


def test_unsupported_filters_are_returned(spark, logdir):
    from pyspark.sql.datasource import EqualTo, StringContains

    rdr = GmallLogsReader({"path": logdir})
    other = EqualTo(("src_file",), "x")
    leftover = list(rdr.pushFilters([other, EqualTo(("day",), "2024-01-02")]))
    assert leftover == [other]
    # and Spark still applies them correctly end-to-end
    register_log_source(spark)
    df = (
        spark.read.format("gmall_logs")
        .load(logdir)
        .filter((F.col("day") == "2024-01-01") & F.col("line").contains("m2"))
    )
    assert df.count() == 1


def test_streaming_offsets_resume(spark, logdir, tmp_path):
    """availableNow run drains the directory; a new file then a second run
    processes ONLY the new file — the offset protocol, observed end-to-end."""
    register_log_source(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("gmall_logs")
            .load(logdir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    assert drain().count() == 4
    import json as _j
    import pathlib

    pathlib.Path(logdir, "log-2024-01-04.jsonl").write_text(
        _j.dumps({"common": {"mid": "m5"}, "ts": 5}) + "\n"
    )
    out2 = drain()
    # checkpoint resume: exactly the unseen file's rows are appended —
    # total 5, the new day present once, the old rows NOT reprocessed
    assert out2.count() == 5
    assert out2.filter(F.col("day") == "2024-01-04").count() == 1


def test_composes_with_parse_layer(spark, logdir):
    """The raw `line` feeds the existing DWD parse operator unchanged."""
    from gmall_spark.operators.parse import parse_json_with_dirty
    from gmall_spark.schemas import BEHAVIOR_LOG_SCHEMA

    register_log_source(spark)
    raw = spark.read.format("gmall_logs").load(logdir)
    clean, dirty = parse_json_with_dirty(raw, "line", BEHAVIOR_LOG_SCHEMA)
    assert clean.count() == 4
    assert dirty.count() == 0
