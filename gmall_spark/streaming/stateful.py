"""Streaming stateful operators — the Flink keyed-state/CEP pieces
(SURVEY §2.7 ST1–ST3) as applyInPandasWithState.

These are the only operators in the engine that need arbitrary keyed state;
everything else is declarative. Each mirrors its batch twin in
operators/stateful.py (same outputs on the same fully-arrived data), and the
tests assert exactly that equivalence.

Scale notes:
- State is partitioned by the entity key (mid/user_id) — same shuffle as the
  batch window functions, RocksDB-backed state store at cluster scale
  (spark.sql.streaming.stateStore.providerClass).
- Event-time timeouts are watermark-driven: a key's timer fires when the
  watermark passes it, which is Flink's event-time timer semantics
  (UserJumpDetailApp's CEP within(10s) timeout path).
- Batches arrive unordered *between* micro-batches; per-key state carries the
  ordering guarantee forward (the reference relies on Kafka per-partition
  order the same way).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def fix_is_new_stream(events: DataFrame, key: str = "user_id") -> DataFrame:
    """ST1 — new/old-visitor repair (BaseLogApp.java:69-94): keyed ValueState
    holding a seen-flag; the first event a key ever shows keeps is_new=1,
    every later one is rewritten to 0. Emits (event_id, key, is_new)."""

    out_schema = f"event_id long, {key} long, is_new int"
    state_schema = "seen int"

    def fn(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = state.get[0] if state.exists else 0
        frames = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            flags = []
            for _ in range(len(pdf)):
                flags.append(0 if seen else 1)
                seen = 1
            frames.append(
                pd.DataFrame(
                    {"event_id": pdf["event_id"], key: pdf[key], "is_new": flags}
                )
            )
        state.update((seen,))
        yield from frames

    return (
        events.groupBy(key)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def dedup_daily_stream(events: DataFrame, key: str = "user_id") -> DataFrame:
    """ST2 — daily UV dedup (UniqueVisitApp.java:45-87): keep each key's first
    event per calendar day. State = last seen date string (the reference's
    ValueState<String> lastVisitDate with 24h TTL — TTL is the memory bound,
    the date compare is the semantics; SURVEY §6a.6).

    Emits (key, dt, first_event_id, first_ts). Requires events ordered within
    the micro-batch (sorted here) and days arriving in order across batches —
    the same assumption the reference makes on Kafka order.
    """

    out_schema = f"{key} long, dt string, first_event_id long, first_ts timestamp"
    state_schema = "dates string"  # comma-joined seen dates (bounded: days in flight)

    def fn(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = set((state.get[0] or "").split(",")) - {""} if state.exists else set()
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, r in pdf.iterrows():
                d = r["ts"].strftime("%Y-%m-%d")
                if d not in seen:
                    seen.add(d)
                    rows.append((key_tuple[0], d, r["event_id"], r["ts"]))
        state.update((",".join(sorted(seen)),))
        if rows:
            yield pd.DataFrame(rows, columns=[key, "dt", "first_event_id", "first_ts"])

    return (
        events.groupBy(key)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def detect_bounce_stream(
    events: DataFrame,
    key: str = "user_id",
    entry_type: str = "view",
    timeout_secs: int = 600,
    watermark: str = "2 seconds",
) -> DataFrame:
    """ST3 — CEP bounce detection with BOTH emit paths
    (UserJumpDetailApp.java:70-120): an entry event is a bounce if the next
    event is another entry (match path, emitted on arrival) or if no event
    arrives within the timeout (timeout path, emitted by the event-time timer
    — Flink's CEP timeout side-output).

    State = the pending entry event; the timer is an EventTimeTimeout set to
    pending.ts + timeout: when the watermark passes it with no follow-up
    event, the pending entry is a timeout-bounce. Emits
    (event_id, key, ts, bounce_reason).
    """

    out_schema = f"event_id long, {key} long, ts timestamp, bounce_reason string"
    state_schema = "pending_id long, pending_ts timestamp"

    def fn(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        k = key_tuple[0]
        if state.hasTimedOut:
            pid, pts = state.get
            state.remove()
            yield pd.DataFrame(
                [(pid, k, pts, "timeout")],
                columns=["event_id", key, "ts", "bounce_reason"],
            )
            return

        pending = state.get if state.exists else None
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, r in pdf.iterrows():
                is_entry = r["event_type"] == entry_type
                if pending is not None:
                    pid, pts = pending
                    gap = (r["ts"] - pts).total_seconds()
                    if gap > timeout_secs:
                        rows.append((pid, k, pts, "timeout"))
                    elif is_entry:
                        rows.append((pid, k, pts, "match"))
                    pending = None
                if is_entry:
                    pending = (r["event_id"], r["ts"])
        if pending is not None:
            state.update(pending)
            # event-time timer: fire when the watermark passes ts + timeout
            state.setTimeoutTimestamp(
                int(pending[1].timestamp() * 1000) + timeout_secs * 1000
            )
        else:
            state.remove()
        if rows:
            yield pd.DataFrame(rows, columns=["event_id", key, "ts", "bounce_reason"])

    return (
        events.withWatermark("ts", watermark)
        .groupBy(key)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )
