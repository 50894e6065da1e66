#!/usr/bin/env python
"""Dump ``explain('formatted')`` for registry entries to files.

Usage: python tools/dump_plans.py <out_dir> <suffix> [--rounds] <entry> [...]

Writes ``<out_dir>/<entry>_<suffix>.txt`` for each entry (suffix is usually
``before`` or ``after``). The plan captured is the physical plan of the
DataFrame the registry function RETURNS; for iterative kernels (pagerank,
LPA, BFS, SSSP, k-core) the builder runs its fixpoint during the call and
localCheckpoint truncates lineage, so the returned frame's plan cannot show
the per-round exchange shape. ``--rounds`` closes that gap (the r8 verdict's
LPA evidence item): it registers extras.graph.ROUND_PLAN_HOOK and appends
each round's PRE-checkpoint ``explain('formatted')`` to the same file, so
exchange-narrowing claims are verifiable from the committed artifact alone.

SPARK_GRAFT_SF_DIR picks the corpus (default /root/testdata/sf0.01 —
explain needs schemas, not volume).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _explain_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    rounds = "--rounds" in names
    if rounds:
        names = [n for n in names if n != "--rounds"]
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
        round_dumps: list[tuple[str, int, str]] = []
        if rounds:
            import gmall_spark.extras.graph as graphmod

            graphmod.ROUND_PLAN_HOOK = lambda kernel, rnd, rdf: round_dumps.append(
                (kernel, rnd, _explain_text(rdf))
            )
        try:
            df = queries[name](spark, sf_dir)
            text = _explain_text(df)
            with open(path, "w") as f:
                f.write(f"# {name} — explain('formatted') @ {sf_dir} [{suffix}]\n")
                f.write(text)
                for kernel, rnd, rtext in round_dumps:
                    f.write(
                        f"\n# {name} — {kernel} round {rnd} PRE-checkpoint plan "
                        f"[{suffix}]\n"
                    )
                    f.write(rtext)
            print(f"dump_plans: wrote {path}", file=sys.stderr)
        except Exception as exc:  # keep going; a failed dump is legible
            rc = 1
            with open(path, "w") as f:
                f.write(f"# {name} FAILED: {exc}\n")
            print(f"dump_plans: {name} FAILED: {exc}", file=sys.stderr)
        finally:
            if rounds:
                graphmod.ROUND_PLAN_HOOK = None
    return rc


if __name__ == "__main__":
    sys.exit(main())
