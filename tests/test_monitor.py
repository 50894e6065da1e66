"""Streaming telemetry: the listener must observe every micro-batch of a
stateful query — input rows totaling the corpus, nonzero keyed state, an
advancing watermark — and expose it as a DataFrame."""

import os
import time

from pyspark.sql import functions as F

from gmall_spark.streaming.monitor import attach, detach
from gmall_spark.streaming.pipelines import run_to_memory, stream_events
from gmall_spark.streaming.stateful import dedup_daily_stream

SF = os.environ.get("GMALL_PARITY_SF", "/root/testdata/sf0.001")


def test_listener_sees_stateful_progress(spark):
    lst = attach(spark)
    try:
        out = run_to_memory(dedup_daily_stream(stream_events(spark, SF)), "mon_uv_t")
        n_out = out.count()
        # listener events are delivered asynchronously; progress for the
        # completed run lands within a bounded wait
        deadline = time.time() + 30
        while time.time() < deadline:
            if any(m["query"] == "mon_uv_t" and m["input_rows"] for m in lst.progress):
                break
            time.sleep(0.5)
        mine = [m for m in lst.progress if m["query"] == "mon_uv_t"]
        assert mine, list(lst.progress)[:3]
        assert sum(m["input_rows"] for m in mine) == 1000  # sf0.001 events
        assert any(m["state_rows"] > 0 for m in mine)  # keyed dedup state
        # watermark is populated only for watermarked queries (this dedup
        # uses NoTimeout keyed state); the field must still be present
        assert all("watermark" in m for m in mine)
        assert n_out > 0

        mf = lst.metrics_frame(spark)
        assert mf.filter(F.col("query") == "mon_uv_t").count() == len(mine)
        assert (
            mf.filter(F.col("query") == "mon_uv_t").agg(F.sum("input_rows")).first()[0]
            == 1000
        )
    finally:
        detach(spark, lst)
