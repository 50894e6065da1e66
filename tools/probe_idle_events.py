"""Probe: what does a quiescent file-stream query report?

Answers three questions that decide the drain design:
1. Does lastProgress ever show numInputRows==0 for a STATELESS query after
   its source is exhausted, and at what cadence (noDataProgressEventInterval
   throttling)?
2. Does a StreamingQueryListener receive onQueryIdle events, and how fast?
3. Does setting spark.sql.streaming.noDataProgressEventInterval low change
   the cadence?
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

interval_ms = sys.argv[1] if len(sys.argv) > 1 else "10000"

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.streaming.noDataProgressEventInterval", interval_ms)
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

t0 = time.monotonic()
events = []


class L(StreamingQueryListener):
    def onQueryStarted(self, e):
        events.append((time.monotonic() - t0, "started", None, None))

    def onQueryProgress(self, e):
        p = e.progress
        sink_rows = None
        try:
            sink_rows = p.sink.numOutputRows
        except Exception:
            pass
        events.append((time.monotonic() - t0, "progress", p.numInputRows, sink_rows))

    def onQueryIdle(self, e):
        events.append((time.monotonic() - t0, "idle", None, None))

    def onQueryTerminated(self, e):
        events.append((time.monotonic() - t0, "terminated", None, None))


spark.streams.addListener(L())

import tempfile

d = tempfile.mkdtemp()
src = os.path.join(d, "src")
os.makedirs(src)
import pandas as pd

pd.DataFrame({"x": [1, 2, 3]}).to_parquet(os.path.join(src, "a.parquet"))

q = (
    spark.readStream.schema("x long")
    .parquet(src)
    .writeStream.format("memory")
    .queryName("probe")
    .outputMode("append")
    .trigger(processingTime="0.3 seconds")
    .start()
)

polls = []
end = time.monotonic() + 25
last = None
while time.monotonic() < end:
    time.sleep(0.3)
    p = q.lastProgress
    key = (p["batchId"], p["numInputRows"]) if p else None
    if key != last:
        polls.append((round(time.monotonic() - t0, 1), key))
        last = key
q.stop()
time.sleep(1)

print("=== listener events ===")
for t, kind, n_in, n_out in events:
    print(f"{t:6.1f}s {kind:10s} in={n_in} out={n_out}")
print("=== lastProgress transitions (batchId, numInputRows) ===")
for t, key in polls:
    print(f"{t:6.1f}s {key}")
spark.stop()
