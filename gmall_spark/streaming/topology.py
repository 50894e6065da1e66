"""Composed live warehouse topology — the reference's defining shape run for
real: multiple CONCURRENT streaming queries chained through storage handoffs.

The reference decouples its layers with Kafka topics (`BaseLogApp.java:22-24`
→ `UniqueVisitApp.java:40-42` / `UserJumpDetailApp.java:64-66` →
`VisitorStatsApp.java:44-46`); here each hop is a parquet directory written
by one streaming query's file sink and discovered live by the next query's
file source — the same decoupling contract (durable, replayable, ordered
discovery) without a broker in the container. Four queries run
SIMULTANEOUSLY:

    q1  DWD base_log   events (3 chunked files, 1/trigger) → cleaned page log
    q2a DWM unique_visit   page log → daily firsts   (keyed NoTimeout state)
    q2b DWM user_jump      page log → bounce records (event-time timers)
    q3  DWS visitor_stats  page ∪ uv ∪ uj → per-window pv/uv/uj counts

Stage 3 aggregates in COMPLETE mode rather than watermark-append: the uj
stream's rows lag the raw stream by up to the 600 s bounce timeout in EVENT
time, so a single union watermark would race the fast pv path and drop early
uj rows nondeterministically — precisely the cross-topic lateness a real
deployment handles by reserving extra out-of-orderness. Complete mode makes
the FINAL state independent of interleaving (every row eventually arrives;
the run stops at quiescence), which is what an end-to-end oracle can check;
per-stage watermark-closure semantics are proven by the dedicated streaming
entries. At production scale the DWS layer would instead widen its watermark
delay by the DWM timeout budget and run append.

Quiescence: all sources exhausted AND every query idle (no input rows) for
several consecutive polls — the window in which stage-2 timers flush (the
engine runs one extra batch after a watermark advance) and their output
drains through stage 3.
"""

from __future__ import annotations

import os
import tempfile
import threading
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

from gmall_spark.streaming.multibatch import stream_event_chunks
from gmall_spark.streaming.stateful import (
    dedup_daily_bucketed_stream,
    dedup_daily_stream,
    detect_bounce_bucketed_stream,
    detect_bounce_stream,
    use_bucketed_state,
)


def _dwm_ops(source_stream: DataFrame):
    """Pick the DWM keyed-state implementations for this run by SOURCE
    volume (stateful.use_bucketed_state): per-key below the threshold (the
    faithful Flink analog — one state row per entity, matching
    UniqueVisitApp/UserJumpDetailApp's keyed state 1:1), bucketed above it
    (the Python-scale recipe: n_buckets Python invocations per batch instead
    of one per active entity — 7.6-13.5x at sf10). The DWD passthrough
    preserves volume, so the raw source size is the right signal for the
    DWM layers reading its output. Both twins emit bit-identically
    (asserted by the twin tests), so the dispatch cannot change the
    topology's oracle."""
    from gmall_spark.streaming.pipelines import _stream_input_bytes

    if use_bucketed_state(_stream_input_bytes(source_stream)):
        return dedup_daily_bucketed_stream, detect_bounce_bucketed_stream
    return dedup_daily_stream, detect_bounce_stream


def _dir(base: str, name: str) -> str:
    d = os.path.join(base, name)
    os.makedirs(d, exist_ok=True)
    return d


#: consecutive onQueryIdle events required from EVERY query with zero
#: executed batches anywhere in between. An idle event means a trigger fired
#: and the engine found no work (no batch executed), so 3 per query spans
#: >= 2 full trigger periods of topology-wide silence — comfortably past the
#: <=1-trigger file-discovery latency of any downstream layer, with margin
#: for a trigger that was mid-listing when an upstream file landed.
_IDLE_STREAK = 3


class _QuiesceListener(StreamingQueryListener):
    """Event-driven quiescence watch over a fixed set of concurrent queries.

    Counts, per tracked runId, the streak of consecutive onQueryIdle events.
    ANY onQueryProgress event from ANY tracked query — i.e. any executed
    batch, data-carrying or zero-input watermark-flush — resets EVERY
    streak: its output (files, flushed timer rows) may feed a downstream
    layer that has not discovered it yet, so the silence clock must restart
    topology-wide. Events from untracked queries (anything else running on
    the shared session) are ignored."""

    def __init__(self, run_ids) -> None:
        self.cond = threading.Condition()
        self._streaks = {rid: 0 for rid in run_ids}
        #: tracked runId -> exception string (or None for a clean stop). A
        #: terminated query can never advance its idle streak, so without
        #: this the drain would block for the full timeout and then mask
        #: q.exception() behind a generic TimeoutError.
        self.terminated: dict[str, str | None] = {}

    def min_streak(self) -> int:
        with self.cond:
            return min(self._streaks.values(), default=0)

    def reset(self) -> None:
        with self.cond:
            for k in self._streaks:
                self._streaks[k] = 0

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        with self.cond:
            if str(event.progress.runId) in self._streaks:
                for k in self._streaks:
                    self._streaks[k] = 0
                self.cond.notify_all()

    def onQueryIdle(self, event) -> None:
        with self.cond:
            rid = str(event.runId)
            if rid in self._streaks:
                self._streaks[rid] += 1
                self.cond.notify_all()

    def onQueryTerminated(self, event) -> None:
        with self.cond:
            rid = str(event.runId)
            if rid in self._streaks:
                self.terminated[rid] = getattr(event, "exception", None)
                self.cond.notify_all()


def _drain(queries, trigger_secs: float, timeout_secs: float, spark=None) -> None:
    """Block until every query has been idle long enough that stage-2 timers
    have flushed (the engine runs one extra batch after a watermark advance)
    and their output has drained through stage 3.

    Event-driven (was: 6 consecutive 0.3 s lastProgress polls, a fixed
    >=1.8 s tail per drain even after true quiescence): a temporary
    StreamingQueryListener counts consecutive onQueryIdle events per query —
    an idle event is the engine reporting a trigger fired and NO batch ran,
    the strongest quiescence signal it emits, and stop() during an idle
    streak cannot interrupt a state-store commit. Quiescence = every query
    at >= _IDLE_STREAK idle events with zero executed batches anywhere in
    the topology in between (see _QuiesceListener), re-verified at
    declaration by the previous poll's condition as a belt: every
    lastProgress shows numInputRows=0 AND no trigger is active (a
    watermark-flush batch reports numInputRows=0 while the NEXT zero-input
    eviction batch is still running, so lastProgress alone can declare
    quiescence mid-commit — observed once as
    CANNOT_WRITE_STATE_STORE.CANNOT_COMMIT aborting the final window flush).

    Callers MUST lower spark.sql.streaming.noDataProgressEventInterval
    (default 10 s) before starting the queries: onQueryIdle is throttled at
    that cadence, so each drain stage otherwise stalls ~10 s per idle event
    waiting for the signal, not for any real work (measured: a 1-file probe
    query emits idle events every ~0.3 s at a 300 ms interval vs 10.0 s at
    the default — tools/probe_idle_events.py)."""
    deadline = time.monotonic() + timeout_secs
    # explicit session preferred: getActiveSession() can return None on a
    # caller thread with no JVM-side active session, which would surface as
    # an opaque AttributeError on .streams instead of a clear error
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "_drain: no SparkSession — pass spark explicitly when driving the "
            "topology from a thread without an active session"
        )
    watch = _QuiesceListener({str(q.runId) for q in queries})
    spark.streams.addListener(watch)
    try:
        while True:
            with watch.cond:
                while min(watch._streaks.values(), default=0) < _IDLE_STREAK:
                    if watch.terminated:
                        rid, exc = next(iter(watch.terminated.items()))
                        raise RuntimeError(
                            f"warehouse topology query {rid} terminated during "
                            f"drain: {exc or 'stopped without exception'}"
                        )
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        raise TimeoutError(
                            f"warehouse topology not quiescent within {timeout_secs}s"
                        )
                    watch.cond.wait(timeout=min(remaining, max(trigger_secs, 0.25)))
            # belt re-verification outside the lock (py4j calls): identical
            # to the old poll condition at its moment of declaration
            progs = [q.lastProgress for q in queries]
            if (
                all(p is not None and p["numInputRows"] == 0 for p in progs)
                and not any(q.status.get("isTriggerActive") for q in queries)
                # a late batch may have reset the streaks BETWEEN the streak
                # condition and the belt; the belt alone can still pass in
                # that window (numInputRows==0 on a flush batch), so declare
                # only if the required post-batch silence still stands
                and watch.min_streak() >= _IDLE_STREAK
            ):
                return
            watch.reset()
    finally:
        spark.streams.removeListener(watch)


def warehouse_e2e(
    spark: SparkSession,
    sf_dir: str,
    trigger_secs: float = 0.3,
    timeout_secs: float = 600.0,
) -> DataFrame:
    """Run the four-query topology to quiescence; returns the DWS result:
    one row per 10-minute window with pv_ct / uv_ct / uj_ct."""
    from gmall_spark.session import spool_dir

    base = spool_dir("e2e_")
    dwd_page = _dir(base, "dwd_page")
    dwm_uv = _dir(base, "dwm_uv")
    dwm_uj = _dir(base, "dwm_uj")
    sink_name = f"e2e_{os.path.basename(base)}"
    trig = {"processingTime": f"{trigger_secs} seconds"}

    from gmall_spark.session import stream_shuffle_width

    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    # wide (cores-tracking) width for the DWD/DWM stages: chunked file
    # passthrough + keyed-pandas state, both parallel-work-bound; the DWS
    # window agg below re-pins to the narrow JVM-state width at its start
    spark.conf.set("spark.sql.shuffle.partitions", str(stream_shuffle_width()))
    # surface idle progress at trigger cadence so _drain sees quiescence when
    # it happens, not at the 10 s default throttle (see _drain docstring);
    # captured per-query at start(), so set before the first start()
    prev_idle = spark.conf.get(
        "spark.sql.streaming.noDataProgressEventInterval", None
    )
    spark.conf.set("spark.sql.streaming.noDataProgressEventInterval", "250ms")
    queries = []
    try:
        # q1 — DWD: chunked event source (one file per trigger), cleaned
        # projection (BaseLogApp's parse/clean stage; our events are already
        # structured, so cleaning = typed projection)
        ev = stream_event_chunks(spark, sf_dir, 3)
        uv_op, uj_op = _dwm_ops(ev)
        q1 = (
            ev.select("event_id", "ts", "user_id", "event_type", "value")
            .writeStream.format("parquet")
            .option("path", dwd_page)
            .option("checkpointLocation", _dir(base, "ck_q1"))
            .outputMode("append")
            .trigger(**trig)
            .start()
        )
        queries.append(q1)

        page_schema = (
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        )

        def page_stream() -> DataFrame:
            return spark.readStream.schema(page_schema).parquet(dwd_page)

        # q2a — DWM unique visit (UniqueVisitApp): daily firsts off the live
        # page log
        q2a = (
            uv_op(page_stream())
            .writeStream.format("parquet")
            .option("path", dwm_uv)
            .option("checkpointLocation", _dir(base, "ck_q2a"))
            .outputMode("append")
            .trigger(**trig)
            .start()
        )
        queries.append(q2a)

        # q2b — DWM user jump (UserJumpDetailApp): CEP bounce with event-time
        # timers off the SAME live page log
        q2b = (
            uj_op(page_stream())
            .writeStream.format("parquet")
            .option("path", dwm_uj)
            .option("checkpointLocation", _dir(base, "ck_q2b"))
            .outputMode("append")
            .trigger(**trig)
            .start()
        )
        queries.append(q2b)

        # q3 — DWS visitor stats (VisitorStatsApp): union the three live
        # layers, count per 10-minute window per metric
        pv = page_stream().select(F.lit("pv").alias("src"), "ts")
        uv = (
            spark.readStream.schema(
                "user_id long, dt string, first_event_id long, first_ts timestamp"
            )
            .parquet(dwm_uv)
            .select(F.lit("uv").alias("src"), F.col("first_ts").alias("ts"))
        )
        uj = (
            spark.readStream.schema(
                "event_id long, user_id long, ts timestamp, bounce_reason string"
            )
            .parquet(dwm_uj)
            .select(F.lit("uj").alias("src"), "ts")
        )
        stats = (
            pv.unionByName(uv)
            .unionByName(uj)
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(
                F.sum(F.when(F.col("src") == "pv", 1).otherwise(0)).cast("long").alias("pv_ct"),
                F.sum(F.when(F.col("src") == "uv", 1).otherwise(0)).cast("long").alias("uv_ct"),
                F.sum(F.when(F.col("src") == "uj", 1).otherwise(0)).cast("long").alias("uj_ct"),
            )
        )
        # a query captures the shuffle conf at START: the pandas-state
        # layers above run wide (parallel Python work), while this JVM
        # window agg takes the narrow JVM-state width — in complete mode it
        # re-commits every window's store each trigger, so per-partition
        # store machinery dominates (see session.stream_jvm_state_width)
        from gmall_spark.session import stream_jvm_state_width

        spark.conf.set("spark.sql.shuffle.partitions", str(stream_jvm_state_width()))
        q3 = (
            stats.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("complete")
            .trigger(**trig)
            .start()
        )
        queries.append(q3)

        _drain(queries, trigger_secs, timeout_secs, spark=spark)
        for q in queries:
            q.stop()
        queries = []
    finally:
        for q in queries:  # error path — don't leak running queries
            try:
                q.stop()
            except Exception:
                pass
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        if prev_idle is None:
            spark.conf.unset("spark.sql.streaming.noDataProgressEventInterval")
        else:
            spark.conf.set(
                "spark.sql.streaming.noDataProgressEventInterval", prev_idle
            )

    from gmall_spark.functions import window_bounds

    # spool + drop the memory sink (same reasoning as run_to_memory: don't
    # pin the result in the JVM for the rest of the session)
    tbl = spark.table(sink_name)
    schema = tbl.schema
    spool = os.path.join(base, "dws_out")
    tbl.write.mode("overwrite").parquet(spool)
    spark.catalog.dropTempView(sink_name)
    out = spark.read.schema(schema).parquet(spool)
    stt, edt = window_bounds(F.col("w"))
    return (
        out.withColumn("stt", stt)
        .withColumn("edt", edt)
        .drop("w")
        .select("stt", "edt", "pv_ct", "uv_ct", "uj_ct")
    )

def warehouse_e2e_append(
    spark: SparkSession,
    sf_dir: str,
    trigger_secs: float = 0.3,
    timeout_secs: float = 600.0,
) -> DataFrame:
    """The PRODUCTION configuration of the four-query topology: the DWS
    window aggregate runs in APPEND mode with its watermark delay widened by
    the DWM timeout budget — the alternative the complete-mode docstring
    (above) documents. Each window emits exactly once, on closure.

    In production, event time tracks wall clock, so "widen by the timeout
    budget" is literally ``bounce_timeout + base_delay``. This replay
    compresses the whole event-time range into seconds of wall clock, which
    breaks that bound (the pv branch jumps the union watermark to max(ts)
    while timer-flushed uj rows still carry early timestamps), so the replay
    makes the lateness budget explicit instead:

    - DWS delay = (event-time range) + 700 s — no real row can EVER be late,
      making the append output independent of how the four queries'
      micro-batches interleave (the nondeterminism complete mode ducked);
    - sentinel A (ts = max + 610 s, filtered out of every aggregate) pushes
      the DWM watermark past every bounce timer, flushing ALL pending
      entries' timeout bounces — the full-flush twin of the complete-mode
      oracle's `pending.ts + 600 s < wm` closure condition;
    - after the uj flush drains, sentinel B (ts = max + delay + 1200 s)
      pushes the DWS watermark past every real window's end, closing them.

    The sentinels never reach any aggregate: the DWS branches filter
    ``ts <= max(real ts)`` AFTER the watermark column is marked, and the
    sentinel's synthetic user (-1) rows from the uv layer carry first_ts >
    max as well. Emission schedule: nothing closes before sentinel B (the
    delay exceeds the range), so the memory sink holds each real window
    exactly once — duplicate emission, a window lost to lateness, or a
    missed timer flush all break the oracle counts."""
    from datetime import timedelta

    import pandas as pd

    from gmall_spark.session import spool_dir, stream_jvm_state_width, stream_shuffle_width
    from gmall_spark.sources import load_table
    from gmall_spark.streaming.multibatch import chunk_events

    lo, hi = load_table(spark, sf_dir, "events").agg(F.min("ts"), F.max("ts")).first()
    range_secs = int((hi - lo).total_seconds()) + 1
    delay_secs = range_secs + 700

    base = spool_dir("e2ea_")
    src = _dir(base, "src")
    # private copy of the chunk files: sentinels must not pollute the shared
    # chunk cache other entries stream from
    shared = chunk_events(spark, sf_dir, 3)
    mtime = 1_600_000_000
    for i, f in enumerate(sorted(os.listdir(shared))):
        dst = os.path.join(src, f)
        with open(os.path.join(shared, f), "rb") as a, open(dst, "wb") as b:
            b.write(a.read())
        os.utime(dst, (mtime + i * 10, mtime + i * 10))

    def _sentinel(tag: str, ts, order: int) -> None:
        pdf = pd.DataFrame(
            {
                "event_id": [-(order + 1)],
                "ts": pd.Series([ts], dtype="datetime64[us]"),
                "user_id": [-1],
                "event_type": ["__flush__"],
                "value": [0.0],
                "props": [None],
            }
        )
        # q1 is already polling src (maxFilesPerTrigger=1, fast trigger) when
        # sentinels land, and parquet writes are not atomic: listing could
        # catch a half-written file and fail the batch. Write under a dotted
        # temp name the FileStreamSource's default filter ignores, set the
        # mtime, then rename — the source only ever sees a complete file.
        p = os.path.join(src, f"zz_sentinel_{tag}.parquet")
        tmp = os.path.join(src, f".zz_sentinel_{tag}.parquet.tmp")
        pdf.to_parquet(tmp, index=False)
        os.utime(tmp, (mtime + 100 + order * 10, mtime + 100 + order * 10))
        os.rename(tmp, p)

    dwd_page = _dir(base, "dwd_page")
    dwm_uv = _dir(base, "dwm_uv")
    dwm_uj = _dir(base, "dwm_uj")
    sink_name = f"e2ea_{os.path.basename(base)}"
    trig = {"processingTime": f"{trigger_secs} seconds"}
    page_schema = (
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    )

    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(stream_shuffle_width()))
    # idle progress at trigger cadence — this topology drains THREE times
    # (pre-sentinel, post-A, post-B), so the 10 s default throttle would
    # stall every cascade per layer (see _drain docstring)
    prev_idle = spark.conf.get(
        "spark.sql.streaming.noDataProgressEventInterval", None
    )
    spark.conf.set("spark.sql.streaming.noDataProgressEventInterval", "250ms")
    queries = []
    try:
        ev = (
            spark.readStream.schema(page_schema + ", props string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        uv_op, uj_op = _dwm_ops(ev)
        q1 = (
            ev.select("event_id", "ts", "user_id", "event_type", "value")
            .writeStream.format("parquet")
            .option("path", dwd_page)
            .option("checkpointLocation", _dir(base, "ck_q1"))
            .outputMode("append")
            .trigger(**trig)
            .start()
        )
        queries.append(q1)

        def page_stream() -> DataFrame:
            return spark.readStream.schema(page_schema).parquet(dwd_page)

        q2a = (
            uv_op(page_stream())
            .writeStream.format("parquet")
            .option("path", dwm_uv)
            .option("checkpointLocation", _dir(base, "ck_q2a"))
            .outputMode("append")
            .trigger(**trig)
            .start()
        )
        queries.append(q2a)
        q2b = (
            uj_op(page_stream())
            .writeStream.format("parquet")
            .option("path", dwm_uj)
            .option("checkpointLocation", _dir(base, "ck_q2b"))
            .outputMode("append")
            .trigger(**trig)
            .start()
        )
        queries.append(q2b)

        pv = page_stream().select(F.lit("pv").alias("src"), "ts")
        uv = (
            spark.readStream.schema(
                "user_id long, dt string, first_event_id long, first_ts timestamp"
            )
            .parquet(dwm_uv)
            .select(F.lit("uv").alias("src"), F.col("first_ts").alias("ts"))
        )
        uj = (
            spark.readStream.schema(
                "event_id long, user_id long, ts timestamp, bounce_reason string"
            )
            .parquet(dwm_uj)
            .select(F.lit("uj").alias("src"), "ts")
        )
        stats = (
            pv.unionByName(uv)
            .unionByName(uj)
            # watermark FIRST (sentinel ts must drive it), filter second
            .withWatermark("ts", f"{delay_secs} seconds")
            .filter(F.col("ts") <= F.lit(hi))
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(
                F.sum(F.when(F.col("src") == "pv", 1).otherwise(0)).cast("long").alias("pv_ct"),
                F.sum(F.when(F.col("src") == "uv", 1).otherwise(0)).cast("long").alias("uv_ct"),
                F.sum(F.when(F.col("src") == "uj", 1).otherwise(0)).cast("long").alias("uj_ct"),
            )
        )
        spark.conf.set("spark.sql.shuffle.partitions", str(stream_jvm_state_width()))
        q3 = (
            stats.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("append")
            .trigger(**trig)
            .start()
        )
        queries.append(q3)

        # Sentinel A is dropped IMMEDIATELY, not after a full-topology drain:
        # it rides the SAME single channel as the real data (src —q1→
        # dwd_page —q2a/q2b→), and ordering is guaranteed end-to-end without
        # any drain — q1's file source takes files oldest-mtime-first (A's
        # pinned mtime sorts after every real chunk), q1 writes batches
        # sequentially, and q2a/q2b discover dwd_page through the file sink's
        # commit log in batch order. So every real page row reaches the DWM
        # state in A's batch or earlier, and a row arriving in the SAME batch
        # as A is still processed under the pre-A watermark (watermarks
        # advance at batch END) — the flushed bounce set is identical to the
        # old drain-then-A schedule (rows pinned by the oracle). A's timer
        # cascade now OVERLAPS the real data flow instead of serializing
        # behind a drained topology (r8 profile: the A cascade alone was
        # ~6.7 s of serial wall).
        #
        # Sentinel B CANNOT be pre-dropped: it must jump the DWS watermark
        # only after q2b's timer-flush rows and q2a's last uv rows are
        # COMMITTED to their directories — those travel dwm_uv/dwm_uj, which
        # q3 discovers independently of dwd_page, so cross-directory order
        # is not guaranteed by any channel. The pre-B drain therefore covers
        # exactly the producing layers {q1, q2a, q2b}: their joint idle
        # streak proves A flowed through q1, both DWM layers consumed
        # everything q1 wrote (including A), and the eviction batches that
        # flush timers have run and committed. q3 is deliberately NOT in the
        # set — any file committed before B lands is listed by q3 in B's
        # batch or earlier, and same-batch rows precede the end-of-batch
        # watermark jump, so q3 keeps ingesting CONCURRENTLY with this drain
        # instead of gating it (the overlap the r8 verdict asked to profile).
        budget = time.monotonic() + timeout_secs
        _sentinel("a_timer_flush", hi + timedelta(seconds=610), 0)
        _drain(queries[:3], trigger_secs, timeout_secs, spark=spark)
        _sentinel("b_window_close", hi + timedelta(seconds=delay_secs + 1200), 1)
        # final drain covers ALL four: B must flow through q1→q3, every
        # closed window must reach the sink, and stop() below must not
        # interrupt a state-store commit anywhere in the topology
        _drain(queries, trigger_secs, max(budget - time.monotonic(), 30.0), spark=spark)
        for q in queries:
            q.stop()
        queries = []
    finally:
        for q in queries:  # error path — don't leak running queries
            try:
                q.stop()
            except Exception:
                pass
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        if prev_idle is None:
            spark.conf.unset("spark.sql.streaming.noDataProgressEventInterval")
        else:
            spark.conf.set(
                "spark.sql.streaming.noDataProgressEventInterval", prev_idle
            )

    from gmall_spark.functions import window_bounds

    tbl = spark.table(sink_name)
    schema = tbl.schema
    spool = os.path.join(base, "dws_out")
    tbl.write.mode("overwrite").parquet(spool)
    spark.catalog.dropTempView(sink_name)
    out = spark.read.schema(schema).parquet(spool)
    stt, edt = window_bounds(F.col("w"))
    return (
        out.withColumn("stt", stt)
        .withColumn("edt", edt)
        .drop("w")
        .select("stt", "edt", "pv_ct", "uv_ct", "uj_ct")
    )
