"""Strict driver-gate replica: runs every ``queries()`` entry against its
``oracle_sql()`` twin and compares the way the external driver does —
``toPandas()`` vs DuckDB ``.df()``, columns sorted by name, rows sorted by
value, then a **representation-sensitive** pandas hash. This is stricter than
``tests/oracle.compare`` (which normalizes ``Decimal`` → str on both sides and
so cannot see the Decimal-object-vs-float64 mismatch that cost 17 green rows
in round 1).

Usage:
    python tools/driver_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> int:
    # hash_pandas_object is dtype- and representation-sensitive: a Decimal
    # object column and a float64 column of equal values hash differently,
    # exactly like the driver's gate.
    return int(pd.util.hash_pandas_object(df, index=False).sum())


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, ".")
    import __spark_entry__ as e
    from gmall_spark.session import get_spark
    from tests.oracle import duck_connection

    spark = get_spark("driver_check")
    con = duck_connection(sf_dir)
    qs, os_ = e.queries(), e.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sp = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            fails.append(name)
            print(f"{name:28s} SPARK-ERR {type(ex).__name__}: {ex}")
            continue
        if name not in os_:
            try:
                sp_c = canon(sp)
                value_hash(sp_c)
                print(f"{name:28s} no-oracle rows={len(sp)} (canon+hash ok)")
            except Exception as ex:  # noqa: BLE001
                fails.append(name)
                print(f"{name:28s} CANON-ERR {type(ex).__name__}: {ex}")
            continue
        try:
            du = con.execute(os_[name]).df()
        except Exception as ex:  # noqa: BLE001
            fails.append(name)
            print(f"{name:28s} ORACLE-ERR {type(ex).__name__}: {ex}")
            continue
        try:
            sp_c, du_c = canon(sp), canon(du)
        except Exception as ex:  # noqa: BLE001
            fails.append(name)
            print(f"{name:28s} CANON-ERR {type(ex).__name__}: {ex}")
            continue
        rows = len(sp_c) == len(du_c)
        schema = list(sp_c.columns) == list(du_c.columns)
        h = rows and schema and value_hash(sp_c) == value_hash(du_c)
        status = "PASS" if (rows and schema and h) else "FAIL"
        if status == "FAIL":
            fails.append(name)
            detail = f"rows={rows}({len(sp_c)}/{len(du_c)}) schema={schema} hash={h}"
            if rows and schema and not h:
                dt = {
                    c: (str(sp_c[c].dtype), str(du_c[c].dtype))
                    for c in sp_c.columns
                    if str(sp_c[c].dtype) != str(du_c[c].dtype)
                }
                detail += f" dtype-mismatch={dt}"
            print(f"{name:28s} FAIL {detail}")
        else:
            print(f"{name:28s} PASS rows={len(sp_c)}")
    print(f"\n{len(qs) - len(fails)}/{len(qs)} pass; fails: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
