"""Driver-faithful correctness simulator.

Mimics the ROUND DRIVER more strictly than tests/oracle.py: fresh plain
SparkSession (no tuned confs), each registry query at sf0.01 vs its DuckDB
oracle, compared via a pandas canonicalizer that does NOT normalize Decimal
objects (Spark DECIMAL -> object dtype Decimal('..') vs DuckDB float64 is a
MISMATCH here, same as the driver's value hash).

Usage:
    python tools/driver_sim.py            # all queries
    python tools/driver_sim.py q1 q2 ...  # only the named queries
"""

from __future__ import annotations

import hashlib
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon_hash(pdf):
    """Canonicalize a pandas frame the way the driver does: columns sorted by
    name, rows sorted by all columns, then hash the string repr of values.
    Unhashable cell types (lists/arrays) crash — as they do in the driver."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    h = hashlib.sha256()
    for row in pdf.itertuples(index=False):
        for v in row:
            h.update(repr(type(v).__name__).encode())
            h.update(repr(v).encode())
        h.update(b"\x00")
    return h.hexdigest()


def main():
    from pyspark.sql import SparkSession

    import duckdb

    import __spark_entry__ as e

    names = sys.argv[1:] or None
    sf_dir = "/root/testdata/sf0.01"

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    if names is None:
        ent = e.entry(spark)
        print(f"entry: {len(ent.collect())} rows  schema={ent.schema.simpleString()[:80]}")

    qs, oracles = e.queries(), e.oracle_sql()
    run = names or list(qs)
    n_pass = n_hash = n_err = 0
    for name in run:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"  {name:28s} NO-ORACLE rows={len(sdf)} (driver records err)")
                n_err += 1
                continue
            ddf = con.execute(oracles[name]).df()
            rows_ok = len(sdf) == len(ddf)
            schema_ok = sorted(sdf.columns) == sorted(ddf.columns)
            hash_ok = rows_ok and schema_ok and canon_hash(sdf) == canon_hash(ddf)
            tag = "PASS" if (rows_ok and schema_ok and hash_ok) else "FAIL"
            if tag == "PASS":
                n_pass += 1
            else:
                n_hash += 1
                detail = f"rows={rows_ok}({len(sdf)}/{len(ddf)}) schema={schema_ok} hash={hash_ok}"
                if not schema_ok:
                    detail += f" s={sorted(sdf.columns)} d={sorted(ddf.columns)}"
                elif not hash_ok and rows_ok:
                    # show first dtype divergence to aid debugging
                    for c in sorted(sdf.columns):
                        if str(sdf[c].dtype) != str(ddf[c].dtype):
                            detail += f" dtype[{c}]: spark={sdf[c].dtype} duck={ddf[c].dtype}"
                            break
                print(f"  {name:28s} {tag} {detail}")
                continue
            print(f"  {name:28s} {tag} ({len(sdf)} rows)")
        except Exception:
            n_err += 1
            print(f"  {name:28s} ERR")
            traceback.print_exc(limit=3)
    print(f"== {n_pass} pass / {n_hash} fail / {n_err} err of {len(run)}")


if __name__ == "__main__":
    main()
