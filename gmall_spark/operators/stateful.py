"""Stateful operators — batch (window-function) forms (SURVEY §2.7).

The reference implements these with Flink keyed state; in batch Spark each
is a window function over (key ORDER BY ts) — one shuffle on the key, then
a streaming-friendly sort within partitions. The true-streaming forms (keyed
state + event-time timers via transformWithStateInPandas) live in
gmall_spark.streaming.stateful.

Scale note: all three shuffle once on the entity key (mid/user_id). That key
is high-cardinality and uniform in this domain, so the shuffle balances; a
window over (user, ts) never materializes more than one user's events in a
sort run — no skew risk unless one device emits a measurable fraction of all
events, in which case AQE skew-split handles the sort spill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_touch(df: DataFrame, key: str, ts_col: str, tiebreak: str) -> DataFrame:
    """ST1 — new/old-visitor repair (BaseLogApp.java:69-94: keyed ValueState;
    if is_new=1 but the mid was seen before, rewrite to 0).

    Batch semantics: a record is "new" iff it is the key's first event.
    Adds ``is_first`` (1/0). Deterministic tie-break on ``tiebreak``.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), F.col(tiebreak).asc())
    return df.withColumn(
        "is_first", F.when(F.row_number().over(w) == 1, F.lit(1)).otherwise(F.lit(0))
    )


def dedup_daily(df: DataFrame, key: str, ts_col: str, tiebreak: str) -> DataFrame:
    """ST2 — daily UV dedup (UniqueVisitApp.java:45-87: keyed ValueState with
    day-string compare + 24h TTL; state keyed by (mid, date), SURVEY §6a.6).

    Keeps each key's first event per calendar day.
    """
    day = F.to_date(F.col(ts_col))
    w = Window.partitionBy(F.col(key), day).orderBy(F.col(ts_col).asc(), F.col(tiebreak).asc())
    return (
        df.withColumn("dt", day)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def detect_bounce(
    df: DataFrame,
    key: str,
    ts_col: str,
    tiebreak: str,
    is_entry,
    timeout: str = "10 seconds",
) -> DataFrame:
    """ST3 — CEP bounce detection (UserJumpDetailApp.java:70-120).

    Reference pattern, keyed by mid: an entry event (last_page_id null)
    followed `within 10s` by another entry event → the first is a bounce
    (matched path); an entry event with NO follow-up event inside 10s → also
    a bounce (timeout side-output path). Both paths union (line 120).

    Batch rewrite — no CEP engine needed: with
    ``nxt = lead(ts) over (partition by key order by ts)`` and
    ``nxt_entry = lead(is_entry)``, an entry event is a bounce iff
      * nxt is null                       (no follow-up at all: timeout)
      * nxt > ts + timeout                (follow-up too late: timeout)
      * nxt_entry                         (follow-up is itself an entry: match)

    Returns input rows that are bounces, with ``bounce_reason``.
    ``is_entry``: Column predicate marking session-entry events.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), F.col(tiebreak).asc())
    qty, unit = timeout.split(" ")
    deadline = F.col(ts_col) + F.expr(f"INTERVAL '{qty}' {unit}")
    nxt_ts = F.lead(F.col(ts_col)).over(w)
    nxt_entry = F.lead(is_entry).over(w)
    return (
        df.withColumn("__entry", is_entry)
        .withColumn("__nxt_ts", nxt_ts)
        .withColumn("__nxt_entry", nxt_entry)
        .filter(F.col("__entry"))
        .withColumn(
            "bounce_reason",
            F.when(F.col("__nxt_ts").isNull() | (F.col("__nxt_ts") > deadline), F.lit("timeout"))
            .when(F.col("__nxt_entry"), F.lit("match"))
            .otherwise(F.lit(None).cast("string")),
        )
        .filter(F.col("bounce_reason").isNotNull())
        .drop("__entry", "__nxt_ts", "__nxt_entry")
    )
