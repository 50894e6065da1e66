"""Mimics the driver's correctness gate: run a registered Spark query and its
DuckDB oracle on the same parquet tables, compare row count + column names +
order-insensitive values (columns sorted by name, rows sorted)."""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

from gmall_spark.schemas import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        # scale-probe dirs (gen_sf --tables) carry only the fact tables a
        # probe reads; register what exists so an oracle touching only
        # those tables still replays — one referencing an absent table
        # fails with DuckDB's own missing-view error, which is legible
        if not os.path.exists(f"{sf_dir}/{t}.parquet"):
            continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        return ("f", round(v, 9)) if not math.isnan(v) else ("f", "nan")
    if isinstance(v, int):
        return ("i", v)
    return (type(v).__name__, str(v))


def compare(spark_df, con, oracle_sql: str) -> tuple[bool, str]:
    duck = con.execute(oracle_sql)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    if sorted(duck_cols) != sorted(spark_cols):
        return False, f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(duck_rows) != len(spark_rows):
        return False, f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"

    s_ix = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_ix = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_set = sorted(tuple(_norm(r[i]) for i in s_ix) for r in spark_rows)
    d_set = sorted(tuple(_norm(r[i]) for i in d_ix) for r in duck_rows)
    if s_set != d_set:
        diff_s = [r for r, d in zip(s_set, d_set) if r != d][:3]
        diff_d = [d for r, d in zip(s_set, d_set) if r != d][:3]
        return False, f"values differ; first spark rows {diff_s} vs duck {diff_d}"
    return True, f"ok ({len(spark_rows)} rows)"
