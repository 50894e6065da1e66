"""Fresh-process driver simulation — the round driver imports
__spark_entry__ in its OWN process with a PLAIN SparkSession (none of
gmall_spark.session's tuned confs). Anything that only works under the
tuned session — legacy parquet confs, timezone pinning, AQE settings —
passes every other test and still fails the external gate; this test
catches that class in CI.

A representative sample (one per module family) keeps it under a minute;
the full 105-query sweep is the verify procedure, not CI.
"""

from __future__ import annotations

import subprocess
import sys

SAMPLE = [
    "visitor_stats",      # queries.py windowed agg (the entry() flagship)
    "asof_view_attrib",   # operators/joins.py asof over events timestamps
    "pricing_summary",    # decimal money math
    "min_cost_supplier",  # queries_tpch.py window decorrelation
    "pagerank_trade",     # extras/graph.py iterative
    "dedup_minhash",      # extras/dedup.py LSH
    "streaming_unique_visit",  # live Structured Streaming machinery
    "streaming_mb_bounce",  # multi-batch harness: chunk files, timers, foreachBatch
    "funnel_conversion",  # higher-order fold + broadcast dim join
]

_SCRIPT = f"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import __spark_entry__ as e
import duckdb
from tests.oracle import compare

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
assert len(e.entry(spark).collect()) > 0, "entry() empty"
qs, os_ = e.queries(), e.oracle_sql()
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {{t}} AS SELECT * FROM "
        f"read_parquet('/root/testdata/sf0.001/{{t}}.parquet')"
    )
failed = []
for name in {SAMPLE!r}:
    ok, msg = compare(qs[name](spark, "/root/testdata/sf0.001"), con, os_[name])
    if not ok:
        failed.append((name, msg[:200]))
assert not failed, failed
print("DRIVER_SIM_OK")
"""


def test_registry_survives_plain_session():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=540,
        cwd="/root/repo",
    )
    assert "DRIVER_SIM_OK" in proc.stdout, proc.stdout[-2000:] + proc.stderr[-3000:]
