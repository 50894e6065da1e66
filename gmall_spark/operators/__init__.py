"""Operator library — each SURVEY §2 row as a composable
``DataFrame -> DataFrame`` function.

Batch implementations are the default (the same declarative plan runs in both
batch and micro-batch modes wherever Spark allows); streaming-only variants
(arbitrary state, watermarks) live in ``gmall_spark.streaming``.
"""

from gmall_spark.operators.windows import tumbling_stats
from gmall_spark.operators.joins import interval_join, dim_enrich
from gmall_spark.operators.stateful import first_touch, dedup_daily, detect_bounce
from gmall_spark.operators.parse import parse_json_with_dirty, decode_cdc, drop_cdc_deletes
from gmall_spark.operators.routing import route_by_config, prune_columns

__all__ = [
    "tumbling_stats",
    "interval_join",
    "dim_enrich",
    "first_touch",
    "dedup_daily",
    "detect_bounce",
    "parse_json_with_dirty",
    "decode_cdc",
    "drop_cdc_deletes",
    "route_by_config",
    "prune_columns",
]
