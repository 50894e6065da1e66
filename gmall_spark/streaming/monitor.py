"""Streaming observability — the ops surface the reference gets from the
Flink web UI (records in/out, watermark lag, state size per operator) and a
Spark deployment gets from StreamingQueryListener.

`MetricsListener` collects per-batch progress into a bounded in-memory
ring: rows/sec, batch duration, per-stateful-operator state rows and
memory, watermark. `metrics_frame` turns the ring into a DataFrame so the
same engine that runs the pipelines can analyze its own telemetry (lag
trending, state growth — the "is state bounded?" question ST7/ST8 answer
by construction, here made observable).

Scale note: listeners run on the driver and receive one progress object
per micro-batch per query — O(batches), never O(rows). The ring bound
keeps a long-lived driver from accumulating telemetry unboundedly; ship
the dicts to a real metrics sink (the JDBC sink works) for retention.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    """Bounded per-batch progress collector (driver-side, O(batches))."""

    def __init__(self, max_batches: int = 1000):
        self.progress: deque = deque(maxlen=max_batches)
        self.started: dict[str, str] = {}
        self.terminated: dict[str, str | None] = {}

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:
        self.started[str(event.id)] = event.name or str(event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        state_rows = 0
        state_bytes = 0
        dropped = 0
        for op in p.stateOperators:
            state_rows += op.numRowsTotal
            state_bytes += op.memoryUsedBytes
            dropped += op.numRowsDroppedByWatermark
        # observedMetrics: df.observe(...) aggregates that rode the batch's
        # own job (no second scan) — keyed by observation name, one Row each
        observed = {
            name: row.asDict()
            for name, row in (p.observedMetrics or {}).items()
        }
        self.progress.append(
            {
                "query": p.name or str(p.id),
                "batch_id": p.batchId,
                "input_rows": p.numInputRows,
                "rows_per_sec": p.processedRowsPerSecond,
                "batch_ms": (p.durationMs or {}).get("triggerExecution", 0),
                "state_rows": state_rows,
                "state_bytes": state_bytes,
                "dropped_by_watermark": dropped,
                "watermark": (p.eventTime or {}).get("watermark"),
                "observed": observed,
            }
        )

    def onQueryTerminated(self, event) -> None:
        self.terminated[str(event.id)] = str(event.exception) if event.exception else None

    def onQueryIdle(self, event) -> None:  # pragma: no cover - version-dependent
        pass

    # -- analysis -----------------------------------------------------------
    def metrics_frame(self, spark):
        """The collected telemetry as a DataFrame (the engine analyzing its
        own ops data)."""
        schema = (
            "query string, batch_id long, input_rows long, rows_per_sec double, "
            "batch_ms long, state_rows long, state_bytes long, watermark string"
        )
        rows = [
            (
                m["query"],
                int(m["batch_id"]),
                int(m["input_rows"]),
                float(m["rows_per_sec"] or 0.0),
                int(m["batch_ms"]),
                int(m["state_rows"]),
                int(m["state_bytes"]),
                m["watermark"],
            )
            for m in self.progress
        ]
        return spark.createDataFrame(rows, schema)


def attach(spark, max_batches: int = 1000) -> MetricsListener:
    lst = MetricsListener(max_batches)
    spark.streams.addListener(lst)
    return lst


def detach(spark, listener: MetricsListener) -> None:
    spark.streams.removeListener(listener)
