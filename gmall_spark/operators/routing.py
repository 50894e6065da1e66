"""Config-driven routing (SURVEY §2.3 T7, §2.4 J4, §2.2 K2/K5).

The reference broadcasts a CDC'd MySQL config table (`table_process`) to all
tasks and routes each change record by (tableName, operateType): prune columns
to the rule's whitelist, tag the sink table, send to Kafka or HBase side
output (BaseDbApp.java:57-90, TableProcessFunction.java:46-166).

Spark design: the config table is small — join it broadcast against the main
stream (batch: once; streaming: re-read per micro-batch inside foreachBatch
for live config updates, SURVEY §4.3). Column pruning over the map payload is
``map_filter`` — JVM-side, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prune_columns(df: DataFrame, data_col: str = "data", cols_col: str = "sink_columns") -> DataFrame:
    """T7 — keep only the rule's whitelisted keys of the `data` map
    (TableProcessFunction.java:152-166). The whitelist is a comma-separated
    string column coming from the joined config row."""
    allowed = F.split(F.col(cols_col), ",")
    return df.withColumn(
        data_col,
        F.map_filter(F.col(data_col), lambda k, _v: F.array_contains(allowed, k)),
    )


def route_by_config(cdc: DataFrame, config: DataFrame) -> DataFrame:
    """J4 — broadcast-join the routing config onto the change stream and
    apply the rule: unmatched records are dropped (reference logs "不存在"
    and filters, TableProcessFunction.java:66-69), matched records get
    sink_type/sink_table tags and pruned payloads.

    Output columns: database, tableName, type, data(pruned), sink_type,
    sink_table — a K2 dynamic-topic Kafka sink can write this directly
    (`topic` column = sink_table).
    """
    cfg = F.broadcast(
        config.select(
            F.col("source_table"),
            F.col("operate_type"),
            F.col("sink_type"),
            F.col("sink_table"),
            F.col("sink_columns"),
            F.col("sink_pk"),
        )
    )
    joined = cdc.join(
        cfg,
        (cdc["tableName"] == cfg["source_table"]) & (cdc["type"] == cfg["operate_type"]),
        "inner",
    )
    return prune_columns(joined).select(
        "database", "tableName", "type", "data", "sink_type", "sink_table", "sink_pk"
    )


def sink_ddl(sink_table: str, sink_columns: str, sink_pk: str | None, sink_extend: str | None) -> str:
    """K5 — auto-create sink DDL from a config rule
    (TableProcessFunction.java:73-120: all-varchar create-if-not-exists with
    the rule's pk). Returns the Spark SQL DDL string."""
    pk = sink_pk or "id"
    cols = [c.strip() for c in sink_columns.split(",") if c.strip()]
    col_ddl = ", ".join(f"`{c}` STRING" for c in cols)
    extend = f" {sink_extend}" if sink_extend else ""
    return (
        f"CREATE TABLE IF NOT EXISTS `{sink_table}` ({col_ddl}) USING parquet "
        f"COMMENT 'pk={pk}'{extend}"
    )


def evolve_sink_ddl(sink_table: str, existing_cols: list[str], sink_columns: str) -> list[str]:
    """K5's missing half: when a config rule GAINS columns after the sink
    table exists (the reference recreates nothing — TableProcessFunction
    only ever issues CREATE IF NOT EXISTS, so added rule columns silently
    never reach the sink). Emit the ALTER TABLE ADD COLUMNS statements for
    the drift instead; removed columns are left in place (additive-only —
    dropping warehouse columns is a human decision, cf. sources/evolve.py's
    refusal to narrow)."""
    want = [c.strip() for c in sink_columns.split(",") if c.strip()]
    have = set(existing_cols)
    added = [c for c in want if c not in have]
    if not added:
        return []
    cols = ", ".join(f"`{c}` STRING" for c in added)
    return [f"ALTER TABLE `{sink_table}` ADD COLUMNS ({cols})"]
