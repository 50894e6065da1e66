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
- Per-batch work is vectorized pandas (sort + shift), not per-row Python:
  only the cross-batch carry (pending entry, seen-set) is scalar state.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def _batch_frame(
    pdfs: Iterator[pd.DataFrame], sort_cols: list[str] | None = None
) -> pd.DataFrame | None:
    """Concatenate a group's micro-batch chunks and sort ONCE globally —
    the only order-sound way to consume the keyed-state chunk iterator.

    Spark hands a group's rows as an iterator of Arrow-batch slices whose
    ORDER IS ARBITRARY: rows within a shuffle partition are clustered by
    key but not time-sorted, so a key whose rows straddle an Arrow-batch
    boundary sees its later chunk first. The previous per-chunk
    sort-then-carry pattern was therefore order-UNSOUND — it passed every
    small-scale gate (groups rarely straddle a 10k-row Arrow batch there)
    and lost 95 of 1,970,000 bounce rows in the first sf10 topology
    verification (BENCH_r08_e2e_sf10_ab.json, the per-key arm; the
    bucketed bounce twin already concatenated before sorting and matched
    the oracle exactly). Memory: this buffers ONE group's batch slice —
    bounded by a key's per-batch volume (per-entity keys: tens of rows)
    or batch/n_buckets for the bucketed family, which already buffered.

    Returns None when the batch holds no rows for the group; the result has
    a fresh positional index (chunk concat repeats labels, and callers use
    positional/iloc logic)."""
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return None
    pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
    return pdf.sort_values(
        sort_cols or ["ts", "event_id"], kind="mergesort"
    ).reset_index(drop=True)


#: streaming source volume above which the production topologies dispatch
#: the keyed operators to their bucketed twins — see use_bucketed_state.
#: 64 MiB keeps every sf<=1 bench source on the faithful per-key shape
#: (events.parquet is ~2 MB at sf0.1, ~20 MB at sf1) while sf10's ~220 MB
#: source — and any production volume — takes the bucketed recipe.
BUCKETED_STATE_MIN_BYTES = 64 << 20


def use_bucketed_state(input_bytes: int | None) -> bool:
    """Volume-based dispatch between the per-key keyed-state operators (the
    faithful Flink analogs: one state row and one Python invocation per
    entity) and their key-coarsened bucketed twins (the Python-scale
    recipe, bit-exact emission equivalence asserted by the twin tests).

    Why volume decides: applyInPandasWithState invokes the Python function
    once per GROUP per micro-batch, so per-entity keying costs O(active
    entities) interpreter crossings — the measured bottleneck at sf10
    (220 MB/source): per-key 81-155 s vs bucketed 8.5-11.5 s on the same
    entries (BENCH_r06_bucketed_state.json, AUDIT r7), while at sf0.1 the
    two are within noise. The signal is the same pre-start source-size
    estimate stream_jvm_state_width uses (pipelines._stream_input_bytes).

    SPARK_GRAFT_BUCKETED_STATE=1/0 forces the choice regardless of volume —
    the A/B and contended-host escape hatch."""
    env = os.environ.get("SPARK_GRAFT_BUCKETED_STATE")
    if env is not None:
        return env.strip().lower() not in ("0", "false", "no", "")
    return bool(input_bytes) and input_bytes >= BUCKETED_STATE_MIN_BYTES


def fix_is_new_stream(events: DataFrame, key: str = "user_id") -> DataFrame:
    """ST1 — new/old-visitor repair (BaseLogApp.java:69-94): keyed ValueState
    holding a seen-flag; the first event a key ever shows keeps is_new=1,
    every later one is rewritten to 0. Emits (event_id, key, is_new)."""

    out_schema = f"event_id long, {key} long, is_new int"
    state_schema = "seen int"

    def fn(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = state.exists and state.get[0] == 1
        # buffer + ONE global sort: the iterator's chunk order is Arrow
        # batch order, NOT event-time order (found at sf10, where a key's
        # rows straddle Arrow-batch boundaries and a per-chunk sort +
        # carry flagged a later event as the first) — see _batch_frame
        pdf = _batch_frame(pdfs)
        if pdf is not None:
            flags = pd.Series(0, index=pdf.index, dtype="int32")
            if not seen:
                flags.iloc[0] = 1
                seen = True
            yield pd.DataFrame(
                {"event_id": pdf["event_id"], key: pdf[key], "is_new": flags}
            )
        state.update((1 if seen else 0,))

    return events.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def dedup_daily_stream(events: DataFrame, key: str = "user_id") -> DataFrame:
    """ST2 — daily UV dedup (UniqueVisitApp.java:45-87): keep each key's first
    event per calendar day. State = seen-dates set (the reference's
    ValueState<String> lastVisitDate with 24h TTL — TTL is the memory bound,
    the date compare is the semantics; SURVEY §6a.6).

    Emits (key, dt, first_event_id, first_ts)."""

    out_schema = f"{key} long, dt string, first_event_id long, first_ts timestamp"
    state_schema = "dates string"  # comma-joined seen dates (bounded: days in flight)

    def fn(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = set((state.get[0] or "").split(",")) - {""} if state.exists else set()
        # one global sort over the batch's chunks (see _batch_frame): the
        # day's FIRST event must be the (ts, event_id) minimum of the whole
        # batch, not of whichever Arrow chunk happened to arrive first
        pdf = _batch_frame(pdfs)
        if pdf is not None:
            dt = pdf["ts"].dt.strftime("%Y-%m-%d")
            firsts = pdf[(~dt.duplicated()) & (~dt.isin(seen))]
            seen.update(dt[~dt.isin(seen)].unique())
            if len(firsts):
                yield pd.DataFrame(
                    {
                        key: firsts[key],
                        "dt": dt.loc[firsts.index],
                        "first_event_id": firsts["event_id"],
                        "first_ts": firsts["ts"],
                    }
                )
        # bounded state — the reference's 24h TTL (UniqueVisitApp.java:55-59)
        # as sliding retention: only the latest day and its predecessor can
        # still receive (bounded-out-of-order) events, older dates are dead.
        if len(seen) > 2:
            seen = set(sorted(seen)[-2:])
        state.update((",".join(sorted(seen)),))

    return events.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
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

    Within a batch the decision is the batch twin's lead() logic, vectorized
    (shift). Across batches: state carries the trailing pending entry, and an
    event-time timer set to pending.ts + timeout emits the timeout-bounce
    when the watermark passes with no follow-up. Emits
    (event_id, key, ts, bounce_reason)."""

    out_schema = f"event_id long, {key} long, ts timestamp, bounce_reason string"
    state_schema = "pending_id long, pending_ts timestamp"
    cols = ["event_id", key, "ts", "bounce_reason"]

    def fn(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        k = key_tuple[0]
        if state.hasTimedOut:
            pid, pts = state.get
            state.remove()
            yield pd.DataFrame([(pid, k, pts, "timeout")], columns=cols)
            return

        pending = tuple(state.get) if state.exists else None
        # global sort across chunks (see _batch_frame): the lead() logic
        # below and the trailing-pending pick are only correct over the
        # batch's true event-time order — per-chunk sorts concatenated in
        # Arrow order lost mid-batch timeout bounces at sf10
        pdf = _batch_frame(pdfs)
        if pdf is None:
            if pending is not None:
                state.update(pending)
                state.setTimeoutTimestamp(
                    int(pending[1].timestamp() * 1000) + timeout_secs * 1000
                )
            return

        # resolve the carried-over pending entry against the first new event
        out_frames = []
        first = pdf.iloc[0]
        if pending is not None:
            pid, pts = pending
            gap = (first["ts"] - pts).total_seconds()
            if gap > timeout_secs:
                out_frames.append(pd.DataFrame([(pid, k, pts, "timeout")], columns=cols))
            elif first["event_type"] == entry_type:
                out_frames.append(pd.DataFrame([(pid, k, pts, "match")], columns=cols))

        # vectorized lead() within the batch
        is_entry = pdf["event_type"].eq(entry_type)
        nxt_ts = pdf["ts"].shift(-1)
        nxt_entry = is_entry.shift(-1)
        gap_late = (nxt_ts - pdf["ts"]).dt.total_seconds() > timeout_secs
        decided = is_entry & nxt_ts.notna()
        reason = pd.Series(pd.NA, index=pdf.index, dtype="object")
        reason[decided & gap_late] = "timeout"
        reason[decided & ~gap_late & nxt_entry.fillna(False).astype(bool)] = "match"
        hits = pdf[reason.notna()]
        if len(hits):
            out_frames.append(
                pd.DataFrame(
                    {
                        "event_id": hits["event_id"],
                        key: hits[key],
                        "ts": hits["ts"],
                        "bounce_reason": reason[reason.notna()],
                    }
                )
            )

        # trailing entry (no follow-up yet) becomes the new pending + timer
        last = pdf.iloc[-1]
        if last["event_type"] == entry_type:
            state.update((int(last["event_id"]), last["ts"]))
            state.setTimeoutTimestamp(
                int(last["ts"].timestamp() * 1000) + timeout_secs * 1000
            )
        else:
            state.remove()
        yield from out_frames

    return (
        events.withWatermark("ts", watermark)
        .groupBy(key)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def ewma_stream(events: DataFrame, key: str = "user_id", alpha: float = 0.5) -> DataFrame:
    """Streaming twin of the batch ewma_user_value entry: per-key EWMA as a
    one-value keyed fold (state = running ewma + event count), emitting the
    updated (key, n_events, ewma) once per micro-batch the key appears in.

    The fold is a deliberate per-row Python loop, NOT a vectorized power-sum:
    EWMA is inherently sequential, and only the literal acc*α' + x*α order
    reproduces the batch twin's F.aggregate fold bit-for-bit (a numpy
    dot-with-powers evaluates the same sum in a different order → an ulp
    off → a different value-hash). The loop runs over one key's rows in one
    micro-batch — same asymptotics as the vectorized path, and the state
    carried between batches is two scalars, never a row buffer."""

    out_schema = f"{key} long, n_events long, ewma double"
    state_schema = "ewma double, n long"
    keep = 1.0 - alpha

    def fn(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        acc, n = (state.get if state.exists else (0.0, 0))
        # one globally-sorted frame per batch (see _batch_frame): the fold
        # order must be the batch's true event-time order, and the oracle
        # models ONE cumulative emission per (key, batch) — the previous
        # per-chunk yield emitted once per Arrow chunk, a latent
        # cardinality mismatch whenever a key straddled a chunk boundary
        pdf = _batch_frame(pdfs)
        if pdf is not None:
            for x in pdf["value"].tolist():
                acc = acc * keep + x * alpha
            n += len(pdf)
            yield pd.DataFrame({key: [key_tuple[0]], "n_events": [n], "ewma": [acc]})
        state.update((acc, n))

    return events.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def gapfill_stream(
    events: DataFrame,
    key: str = "event_type",
    ts: str = "ts",
    watermark: str = "2 seconds",
) -> DataFrame:
    """Streaming gap-fill + LOCF — the timer-driven twin of the batch
    gapfill_locf entry, and the one operator here that EMITS SYNTHETIC ROWS:
    hourly buckets with no data at all are materialized (with the last
    observed count carried forward) as the watermark closes them. Flink
    users build this with registerEventTimeTimer; Spark has no built-in, so
    it is keyed state (pending bucket counts + emission cursor + LOCF carry)
    plus an event-time timer that wakes the key when its next bucket can
    close — including on batches where the key received NO data (the
    heartbeat path a windowed agg cannot express, since windows only exist
    where rows do).

    Emission rule (deterministic, oracle-replayable): a bucket [b, b+1h)
    emits in the first invocation whose watermark wm satisfies
    b + 1h <= wm; the per-key grid runs from the key's first observed
    bucket through the last closed bucket, is_gap marking synthesized rows.
    State is the open-bucket tail plus two scalars — bounded by the key's
    out-of-orderness, not its history."""

    hour = 3_600_000
    out_schema = f"{key} string, bucket timestamp, filled_ct long, is_gap boolean"
    state_schema = "bms array<long>, cts array<long>, nxt long, carry long"

    def fn(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            bms, cts, nxt, carry = state.get
            obs = dict(zip(list(bms), list(cts)))
        else:
            obs, nxt, carry = {}, None, None
        for pdf in pdfs:
            if not len(pdf):
                continue
            # unit-agnostic epoch-ms (Arrow hands ns here, µs elsewhere)
            ms = (pdf[ts] - pd.Timestamp(0)) // pd.Timedelta(milliseconds=1)
            b = ms // hour * hour
            for bm, c in b.value_counts().items():
                obs[int(bm)] = obs.get(int(bm), 0) + int(c)
        wm = state.getCurrentWatermarkMs()
        rows = []
        if obs and nxt is None:
            nxt = min(obs)
        if nxt is not None:
            # belt: the watermark pre-filter already drops rows of closed
            # buckets; never let one resurrect an emitted bucket
            obs = {b: c for b, c in obs.items() if b >= nxt}
        if nxt is not None and wm > 0:
            last_closed = (wm - hour) // hour * hour
            while nxt <= last_closed:
                c = obs.pop(nxt, None)
                if c is not None:
                    carry = c
                    rows.append((nxt, c, False))
                else:
                    rows.append((nxt, carry, True))
                nxt += hour
        if rows:
            yield pd.DataFrame(
                {
                    key: key_tuple[0],
                    "bucket": pd.to_datetime([r[0] for r in rows], unit="ms"),
                    "filled_ct": [r[1] for r in rows],
                    "is_gap": [r[2] for r in rows],
                }
            )
        ks = sorted(obs)
        state.update((ks, [obs[k] for k in ks], nxt, carry))
        if obs:
            # wake this key when its next pending bucket can close (strictly
            # beyond the current watermark, as the API requires)
            state.setTimeoutTimestamp(max(wm + 1, (min(obs) + hour)))

    return (
        events.withWatermark(ts, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def fix_is_new_tws(events: DataFrame, key: str = "user_id") -> DataFrame:
    """ST1 on the Spark 4 transformWithStateInPandas API: the same seen-flag
    repair as fix_is_new_stream, but with typed per-key ValueState managed by
    a StatefulProcessor — the closest structural analog to the reference's
    Flink ValueState code (BaseLogApp.java:69-94), and the forward path for
    new stateful operators (multiple typed state variables, timers, TTL are
    first-class on this API).

    Requires `protobuf` (the TWS state-server protocol) — wired up from the
    image's gcloud-vendored runtime by compat.ensure_protobuf (see its
    docstring); the applyInPandasWithState twins remain the default
    production path, and the equivalence test + the streaming_tws_is_new
    registry entry exercise this one."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas needs the protobuf package; use "
            "fix_is_new_stream (applyInPandasWithState) in this environment"
        ) from exc
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField(key, T.LongType()),
            T.StructField("is_new", T.IntegerType()),
        ]
    )

    class IsNewProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.seen = handle.getValueState(
                "seen", T.StructType([T.StructField("v", T.IntegerType())])
            )

        def handleInputRows(self, key_tuple, rows, timerValues):
            seen = self.seen.exists() and self.seen.get()[0] == 1
            # one global sort across the TWS chunk iterator — same
            # order-soundness contract as the GroupState twins
            pdf = _batch_frame(rows)
            if pdf is not None:
                flags = pd.Series(0, index=pdf.index, dtype="int32")
                if not seen:
                    flags.iloc[0] = 1
                    seen = True
                yield pd.DataFrame(
                    {"event_id": pdf["event_id"], key: pdf[key], "is_new": flags}
                )
            self.seen.update((1 if seen else 0,))

        def close(self) -> None:
            pass

    # transformWithState runs only on the RocksDB state store (its column-
    # family model); the default HDFS-backed store can't host it
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return events.groupBy(key).transformWithStateInPandas(
        IsNewProcessor(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )


def detect_bounce_tws(
    events: DataFrame,
    key: str = "user_id",
    entry_type: str = "view",
    timeout_secs: int = 600,
    watermark: str = "2 seconds",
) -> DataFrame:
    """ST3 on the transformWithState timer API: the same CEP-with-timeout as
    detect_bounce_stream (UserJumpDetailApp.java:70-120), but the timeout
    path runs on FIRST-CLASS event-time timers (handle.registerTimer /
    handleExpiredTimer) instead of applyInPandasWithState's single implicit
    timeout slot. Semantics are identical — match and in-batch timeout
    decisions emit from handleInputRows; a trailing entry parks one
    (pending_id, pending_ts) pair in ValueState with a timer at
    ms-floor(ts)+timeout, and handleExpiredTimer emits the timeout bounce
    when the watermark passes it.

    Why this twin exists: timers are where TWS earns its keep over the
    GroupState API (many per key, listable, deletable — a key replacing its
    pending entry deletes the stale timer instead of overwriting a slot),
    and the timer column family is a distinct state shape whose eviction
    the metrics-level test pins (numRowsRemoved must track resolved
    pendings, not history). Requires protobuf + RocksDB store, exactly like
    fix_is_new_tws."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas needs the protobuf package; use "
            "detect_bounce_stream (applyInPandasWithState) in this environment"
        ) from exc

    from pyspark.sql import types as T
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField(key, T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("bounce_reason", T.StringType()),
        ]
    )
    cols = ["event_id", key, "ts", "bounce_reason"]
    timeout_ms = timeout_secs * 1000

    class BounceProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            # pending trailing entry: (event_id, event-time as epoch micros).
            # Micros-as-long rather than a timestamp field: the state row
            # round-trips through the TWS Arrow protocol bit-exactly, and
            # the timer expiry derives from the same integer (no tz/unit
            # coupling between the two column families).
            self.pending = handle.getValueState(
                "pending",
                T.StructType(
                    [
                        T.StructField("pending_id", T.LongType()),
                        T.StructField("pending_us", T.LongType()),
                    ]
                ),
            )

        def _clear(self) -> None:
            self.pending.clear()
            for t in self.handle.listTimers():
                self.handle.deleteTimer(t)

        def _park(self, event_id: int, ts: pd.Timestamp) -> None:
            us = int(ts.value // 1_000)
            for t in self.handle.listTimers():
                self.handle.deleteTimer(t)
            self.pending.update((int(event_id), us))
            self.handle.registerTimer(us // 1000 + timeout_ms)

        def handleInputRows(self, key_tuple, rows, timerValues):
            k = key_tuple[0]
            # global sort across chunks (see _batch_frame) — per-chunk
            # sorts concatenated in Arrow order lost mid-batch timeouts
            pdf = _batch_frame(rows)
            if pdf is None:
                return

            out_frames = []
            # resolve the carried-over pending entry against the first new
            # event — the event-time gap decides before any watermark does
            if self.pending.exists():
                pid, pus = self.pending.get()
                pts = pd.Timestamp(pus * 1_000)
                gap = (pdf.iloc[0]["ts"] - pts).total_seconds()
                if gap > timeout_secs:
                    out_frames.append(
                        pd.DataFrame([(pid, k, pts, "timeout")], columns=cols)
                    )
                elif pdf.iloc[0]["event_type"] == entry_type:
                    out_frames.append(
                        pd.DataFrame([(pid, k, pts, "match")], columns=cols)
                    )

            # vectorized lead() within the batch — identical to the
            # applyInPandasWithState twin
            is_entry = pdf["event_type"].eq(entry_type)
            nxt_ts = pdf["ts"].shift(-1)
            nxt_entry = is_entry.shift(-1)
            gap_late = (nxt_ts - pdf["ts"]).dt.total_seconds() > timeout_secs
            decided = is_entry & nxt_ts.notna()
            reason = pd.Series(pd.NA, index=pdf.index, dtype="object")
            reason[decided & gap_late] = "timeout"
            reason[decided & ~gap_late & nxt_entry.fillna(False).astype(bool)] = "match"
            hits = pdf[reason.notna()]
            if len(hits):
                out_frames.append(
                    pd.DataFrame(
                        {
                            "event_id": hits["event_id"],
                            key: hits[key],
                            "ts": hits["ts"],
                            "bounce_reason": reason[reason.notna()],
                        }
                    )
                )

            last = pdf.iloc[-1]
            if last["event_type"] == entry_type:
                self._park(last["event_id"], last["ts"])
            else:
                self._clear()
            yield from out_frames

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # (named ``key``: the engine invokes this hook with keyword
            # arguments, unlike handleInputRows.) The engine scans timers
            # AFTER input processing, so a pending replaced mid-batch
            # deleted its stale timer and never lands here; the exists()
            # guard is belt-and-braces for a clear race.
            if not self.pending.exists():
                return
            pid, pus = self.pending.get()
            # only the value state: the firing timer is auto-removed by the
            # engine, and deleting it again logs a TimerStateImpl warning
            self.pending.clear()
            yield pd.DataFrame(
                [(pid, key[0], pd.Timestamp(pus * 1_000), "timeout")],
                columns=cols,
            )

        def close(self) -> None:
            pass

    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(key)
        .transformWithStateInPandas(
            BounceProcessor(),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="eventTime",
        )
    )


def dedup_daily_bucketed_stream(
    events: DataFrame, key: str = "user_id", n_buckets: int | None = None
) -> DataFrame:
    """ST2 with KEY-COARSENED state — the 100 TB shape of dedup_daily_stream.

    applyInPandasWithState invokes the Python function once per GROUP per
    micro-batch, so keying state by the raw entity id costs one Python call
    per active entity (~300k calls/batch at sf10 — measured as the dominant
    cost of streaming_mb_unique_visit's 108 s sf10 row; the width A/B in
    BENCH_r06_sf10_streaming.json showed no knob fixes it because the calls,
    not the partitions, are the bottleneck). This twin groups by
    hash(key) % n_buckets instead and keeps each bucket's seen set as ONE
    state row of int64 codes (user·2¹⁶ + epoch-day — day fits 16 bits until
    year 2149), so a batch pays n_buckets Python calls total, independent of
    the entity count. Semantics are IDENTICAL to the per-key twin (same
    first-touch-per-(user, day) emission in the same micro-batch, asserted
    bit-exact by the equivalence test and the shared oracle): within a
    bucket the batch is sorted by (ts, event_id) and deduped per code, which
    coincides with each user's own event-time order.

    Retention mirrors the per-key twin's two-day window, but bounded by the
    bucket's MAX day rather than per user (codes older than max-1 day are
    dropped): with time-ordered arrival (the chunked sources here; Kafka
    per-partition order in the reference) no new event can be older than
    that, so the trim is emission-invariant — and it is the stronger memory
    bound, because a dormant user's dead days don't linger.

    The trade: per-bucket state rows are wider (the whole seen set
    serializes through Arrow every batch instead of one tiny row per
    touched key). n_buckets controls that balance — default 4× the pandas
    width, keeping rows ~thousands of codes at bench scales while the call
    count stays in the hundreds. Flink has no analog knob (its keyed state
    is JVM-side per-key with no per-group invocation cost); this is a
    Python-runtime-specific scale technique, which is exactly why it gets
    its own registry entry instead of replacing the faithful per-key twin.
    """
    from pyspark.sql import functions as F

    from gmall_spark.session import stream_shuffle_width

    if n_buckets is None:
        n_buckets = 4 * stream_shuffle_width()

    out_schema = f"{key} long, dt string, first_event_id long, first_ts timestamp"
    state_schema = "codes array<long>"
    _DAY_BITS = 1 << 16

    def fn(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0] or ()) if state.exists else set()
        # global sort across chunks (see _batch_frame): within a bucket the
        # per-(user, day) FIRST must be the batch-wide (ts, event_id) min
        pdf = _batch_frame(pdfs)
        if pdf is not None:
            day = pdf["ts"].to_numpy().astype("datetime64[D]").astype("int64")
            code = pd.Series(
                pdf[key].to_numpy() * _DAY_BITS + day, index=pdf.index
            )
            fresh = pdf[(~code.duplicated()) & (~code.isin(seen))]
            seen.update(code.loc[fresh.index].tolist())
            if len(fresh):
                yield pd.DataFrame(
                    {
                        key: fresh[key],
                        "dt": fresh["ts"].dt.strftime("%Y-%m-%d"),
                        "first_event_id": fresh["event_id"],
                        "first_ts": fresh["ts"],
                    }
                )
        if seen:
            horizon = max(c % _DAY_BITS for c in seen) - 1
            seen = {c for c in seen if c % _DAY_BITS >= horizon}
        state.update((sorted(seen),))

    return (
        events.withColumn(
            "_bkt", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets))
        )
        .groupBy("_bkt")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def detect_bounce_bucketed_stream(
    events: DataFrame,
    key: str = "user_id",
    entry_type: str = "view",
    timeout_secs: int = 600,
    watermark: str = "2 seconds",
    n_buckets: int | None = None,
) -> DataFrame:
    """ST3 with KEY-COARSENED state — the bucketed-seen-set pattern
    (dedup_daily_bucketed_stream) extended to the CEP operator, the first
    of the family that needs TIMERS: per-key pending entries live as three
    parallel arrays (key, pending_id, pending_ts-micros) in ONE state row
    per hash bucket, so a micro-batch costs n_buckets Python invocations
    instead of one per active entity (the measured bottleneck of
    streaming_mb_bounce's 140-228 s sf10 rows).

    The per-key event-time timer becomes one bucket timer at the MIN
    pending deadline plus an explicit watermark sweep: every invocation
    (input or timeout) emits exactly the pendings with
    ``watermark > ms(ts) + timeout`` — the same STRICTLY-beyond predicate
    Spark applies when firing the per-key twin's timers, read from
    ``state.getCurrentWatermarkMs()``. The sweep must run on the INPUT path
    too: a bucket that receives any event is not eligible for a timeout
    invocation that batch, yet per-key twins of its OTHER keys would fire —
    without the sweep those emissions arrive a batch late and the
    emit_batch equivalence breaks.

    In-batch decisions are the per-key twin's vectorized lead() logic run
    per key via groupby shifts (sort by (key, ts, event_id)); carried
    pendings resolve against each key's FIRST batch event with the same
    integer-microsecond gap comparison; each key's trailing entry becomes
    its new pending. Bit-exact emission equivalence against
    detect_bounce_stream — batch-for-batch, both emit paths — is asserted
    by the twin test and the shared multi-batch oracle."""
    from pyspark.sql import functions as F

    from gmall_spark.session import stream_shuffle_width

    if n_buckets is None:
        n_buckets = 4 * stream_shuffle_width()

    out_schema = f"event_id long, {key} long, ts timestamp, bounce_reason string"
    state_schema = "ks array<long>, pids array<long>, ptsus array<long>"
    cols = ["event_id", key, "ts", "bounce_reason"]
    tmo_ms = timeout_secs * 1000
    tmo_us = timeout_secs * 1_000_000

    import numpy as np

    _EMPTY = np.empty(0, dtype="int64")

    def _load(state: GroupState):
        # state as three aligned int64 arrays (key, pending_id, pending_ts µs)
        if not state.exists:
            return _EMPTY, _EMPTY, _EMPTY
        ks, pids, ptsus = state.get
        return (
            np.asarray(ks or (), dtype="int64"),
            np.asarray(pids or (), dtype="int64"),
            np.asarray(ptsus or (), dtype="int64"),
        )

    def _frame(pids, ks, ptsus, reason) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": pd.Series(pids, dtype="int64"),
                key: pd.Series(ks, dtype="int64"),
                "ts": pd.to_datetime(ptsus, unit="us"),
                "bounce_reason": reason,
            }
        )

    def _store(state: GroupState, ks, pids, ptsus) -> None:
        if len(ks):
            order = np.argsort(ks, kind="stable")
            ks, pids, ptsus = ks[order], pids[order], ptsus[order]
            state.update((ks.tolist(), pids.tolist(), ptsus.tolist()))
            state.setTimeoutTimestamp(int(ptsus.min()) // 1000 + tmo_ms)
        else:
            state.remove()

    def fn(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ks, pids, ptsus = _load(state)
        wm_ms = state.getCurrentWatermarkMs()
        chunks = None if state.hasTimedOut else [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            # timeout invocation, or an input invocation with no rows:
            # fire every pending the watermark has passed
            due = wm_ms > (ptsus // 1000 + tmo_ms)
            frame = _frame(pids[due], ks[due], ptsus[due], "timeout") if due.any() else None
            keep = ~due
            _store(state, ks[keep], pids[keep], ptsus[keep])
            if frame is not None:
                yield frame
            return
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        # positional index: chunk concat repeats labels, and the array
        # lookups below assume index == position
        pdf = pdf.sort_values([key, "ts", "event_id"], kind="mergesort").reset_index(drop=True)
        kcol = pdf[key].to_numpy()
        ts_us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        eid = pdf["event_id"].to_numpy()
        entry_m = pdf["event_type"].eq(entry_type).to_numpy()

        # per-key first/last positions (rows are key-sorted; uniq ascends)
        uniq, first_pos = np.unique(kcol, return_index=True)
        last_pos = len(kcol) - 1 - np.unique(kcol[::-1], return_index=True)[1]

        out_frames = []
        # classify carried pendings: present keys resolve against their
        # FIRST batch event; absent keys whose deadline the watermark passed
        # fire here — their per-key twins' timers fire this batch, but this
        # bucket got input so no timeout invocation comes (see docstring)
        if len(ks):
            idx = np.searchsorted(uniq, ks)
            present = uniq[np.minimum(idx, len(uniq) - 1)] == ks
            absent_due = (~present) & (wm_ms > ptsus // 1000 + tmo_ms)
            if absent_due.any():
                out_frames.append(
                    _frame(pids[absent_due], ks[absent_due], ptsus[absent_due], "timeout")
                )
            if present.any():
                pi = idx[present]
                gap = ts_us[first_pos[pi]] - ptsus[present]
                t_m = gap > tmo_us
                m_m = (~t_m) & entry_m[first_pos[pi]]
                for mask, why in ((t_m, "timeout"), (m_m, "match")):
                    if mask.any():
                        out_frames.append(
                            _frame(
                                pids[present][mask],
                                ks[present][mask],
                                ptsus[present][mask],
                                why,
                            )
                        )
            keep = (~present) & (~absent_due)
        else:
            keep = np.zeros(0, dtype=bool)

        # vectorized lead() per key within the batch: rows are sorted by
        # (key, ts, event_id), so row i+1 is the same key's next event iff
        # the key doesn't change there
        n = len(kcol)
        nxt_same = np.zeros(n, dtype=bool)
        nxt_same[:-1] = kcol[1:] == kcol[:-1]
        # zeros (not empty): the last element never survives the `decided`
        # mask, but it still flows through the (nxt_ts - ts_us) subtraction —
        # an uninitialized int64 there can trip numpy overflow warnings
        nxt_ts = np.zeros(n, dtype="int64")
        nxt_ts[:-1] = ts_us[1:]
        nxt_entry = np.zeros(n, dtype=bool)
        nxt_entry[:-1] = entry_m[1:]
        decided = entry_m & nxt_same
        t_hits = decided & ((nxt_ts - ts_us) > tmo_us)
        m_hits = decided & ~t_hits & nxt_entry
        hits = t_hits | m_hits
        if hits.any():
            out_frames.append(
                pd.DataFrame(
                    {
                        "event_id": eid[hits],
                        key: kcol[hits],
                        "ts": pdf["ts"].to_numpy()[hits],
                        "bounce_reason": np.where(t_hits[hits], "timeout", "match"),
                    }
                )
            )

        # each key's trailing entry becomes its new pending (disjoint from
        # the kept pendings — those keys are absent from the batch)
        l_entry = entry_m[last_pos]
        _store(
            state,
            np.concatenate([ks[keep], uniq[l_entry]]),
            np.concatenate([pids[keep], eid[last_pos][l_entry]]),
            np.concatenate([ptsus[keep], ts_us[last_pos][l_entry]]),
        )
        yield from out_frames

    return (
        events.withWatermark("ts", watermark)
        .withColumn("_bkt", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)))
        .groupBy("_bkt")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def fix_is_new_bucketed_stream(
    events: DataFrame, key: str = "user_id", n_buckets: int | None = None
) -> DataFrame:
    """ST1 with KEY-COARSENED state — dedup_daily_bucketed_stream's pattern
    applied to the is_new repair, proving the technique generalizes beyond
    one operator: group by hash(key) % n_buckets and keep the bucket's
    ever-seen key ids as one array<long> state row, so a micro-batch costs
    n_buckets Python invocations instead of one per active entity (the
    measured bottleneck of the per-key twins at sf10 — see
    BENCH_r06_bucketed_state.json).

    Emission is identical to fix_is_new_stream: within a bucket the batch
    is sorted by (ts, event_id), and a key's first-ever event (first
    occurrence in batch AND not in the seen set) keeps is_new=1. Restricted
    to one key, the bucket's sort order IS that key's event-time order, so
    first-occurrence coincides per key.

    State volume equals the per-key twin's (one int64 per ever-seen key
    either way — there is no two-day horizon to trim here, exactly like the
    per-key version whose store keeps one row per key forever); the
    re-packing trades per-group invocation cost for re-serializing each
    TOUCHED bucket's array every batch. n_buckets is the balance knob: at
    ~1e9 keys per bucket-arrays would be ~30 MB at the default, so a
    cluster deployment raises n_buckets with the key universe (state stays
    sharded across width partitions regardless)."""
    from pyspark.sql import functions as F

    from gmall_spark.session import stream_shuffle_width

    if n_buckets is None:
        n_buckets = 4 * stream_shuffle_width()

    out_schema = f"event_id long, {key} long, is_new int"
    state_schema = "uids array<long>"

    def fn(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0] or ()) if state.exists else set()
        # global sort across chunks (see _batch_frame): within a bucket a
        # key's first-EVER event must be the batch-wide (ts, event_id) min
        pdf = _batch_frame(pdfs)
        if pdf is not None:
            uid = pdf[key]
            first = (~uid.duplicated()) & (~uid.isin(seen))
            seen.update(uid[first].tolist())
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    key: uid,
                    "is_new": first.astype("int32"),
                }
            )
        state.update((sorted(seen),))

    return (
        events.withColumn(
            "_bkt", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets))
        )
        .groupBy("_bkt")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )
