#!/usr/bin/env python
"""Dump ``explain('formatted')`` for registry entries to files.

Usage: python tools/dump_plans.py <out_dir> <suffix> <entry> [entry ...]

Writes ``<out_dir>/<entry>_<suffix>.txt`` for each entry (suffix is usually
``before`` or ``after``). The plan captured is the physical plan of the
DataFrame the registry function RETURNS; for iterative kernels (pagerank,
LPA) the builder runs its fixpoint during the call and the returned frame
reads the materialized result, so the per-round join plan is documented by
the tool's stderr job descriptions / the entry's own plan lint instead —
the dump still pins the result-side shape.

SPARK_GRAFT_SF_DIR picks the corpus (default /root/testdata/sf0.01 —
explain needs schemas, not volume).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)

    from gmall_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    rc = 0
    for name in names:
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = queries[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(path, "w") as f:
                f.write(f"# {name} — explain('formatted') @ {sf_dir} [{suffix}]\n")
                f.write(buf.getvalue())
            print(f"dump_plans: wrote {path}", file=sys.stderr)
        except Exception as exc:  # keep going; a failed dump is legible
            rc = 1
            with open(path, "w") as f:
                f.write(f"# {name} FAILED: {exc}\n")
            print(f"dump_plans: {name} FAILED: {exc}", file=sys.stderr)
    return rc


if __name__ == "__main__":
    sys.exit(main())
