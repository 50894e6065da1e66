"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in gmall_spark (see SURVEY.md §2 for the operator
inventory this covers); this module is just the registry surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Wire up the image's vendored protobuf (transformWithState wire protocol)
# at import time: the driver imports this module BEFORE building its own
# SparkSession, and the Python-worker env is captured when that JVM starts.
from gmall_spark.compat import ensure_protobuf as _ensure_protobuf

_ensure_protobuf()


def _registry():
    from gmall_spark import queries as core
    import gmall_spark.extras.graph  # noqa: F401 — registers graph entries
    import gmall_spark.extras.queries  # noqa: F401 — registers extras on import
    import gmall_spark.queries_tpch  # noqa: F401 — registers TPC-H-shape entries
    import gmall_spark.streaming.queries  # noqa: F401 — registers streaming entries

    return core.QUERIES, core.ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: visitor_stats (tumbling-window multi-agg) on sf0.001."""
    q, _ = _registry()
    return q["visitor_stats"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q, _ = _registry()
    return dict(q)


def oracle_sql() -> dict[str, str]:
    _, o = _registry()
    return dict(o)
