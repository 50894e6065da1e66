"""The reference's pipelines (one Flink job each, SURVEY §0) reassembled from
the operator library. Each app is a pure ``DataFrame -> DataFrame(s)``
composition usable in batch or behind a streaming source; Kafka hops between
reference apps become function composition (tests) or real topics (prod).
"""

from gmall_spark.apps.fixtures import behavior_log, behavior_log_json
from gmall_spark.apps.warehouse import (
    base_log_app,
    keyword_stats_app,
    order_wide_app,
    product_stats_app,
    unique_visit_app,
    user_jump_app,
    visitor_stats_app,
)

__all__ = [
    "behavior_log",
    "behavior_log_json",
    "base_log_app",
    "keyword_stats_app",
    "order_wide_app",
    "product_stats_app",
    "unique_visit_app",
    "user_jump_app",
    "visitor_stats_app",
]
