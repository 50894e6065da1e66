from gmall_spark.streaming.pipelines import (
    interval_join_stream,
    run_to_memory,
    stream_events,
    windowed_stats_stream,
)

__all__ = [
    "interval_join_stream",
    "run_to_memory",
    "stream_events",
    "windowed_stats_stream",
]
