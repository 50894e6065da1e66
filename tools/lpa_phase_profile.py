#!/usr/bin/env python
"""Phase profile for label_communities at a given corpus: times every
materialization barrier (pairs checkpoint, each round's checkpoint, bounds
agg, final count) by wrapping session.iter_checkpoint, and prints one JSON
line. Fresh session; run solo — this exists to answer WHERE the sf100 wall
goes (guide §1: measure first), not to produce a committable bench number.

Usage: python tools/lpa_phase_profile.py <sf_dir> [out.json]
Env: the usual session knobs (SPARK_GRAFT_DRIVER_MEM etc.).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    import gmall_spark.session as sess
    from gmall_spark.session import get_spark

    spark = get_spark("lpa_phase_profile")
    spark.range(1000).count()

    phases: list[tuple[str, float]] = []
    orig = sess.iter_checkpoint
    t_last = [time.perf_counter()]

    def mark(label: str) -> None:
        now = time.perf_counter()
        phases.append((label, round(now - t_last[0], 1)))
        print(f"phase: {label}: {phases[-1][1]}s", file=sys.stderr, flush=True)
        t_last[0] = now

    n_ckpt = [0]

    def timed(df):
        r = orig(df)
        n_ckpt[0] += 1
        mark(f"checkpoint_{n_ckpt[0]}")
        return r

    sess.iter_checkpoint = timed
    try:
        import __spark_entry__ as entrymod

        queries = entrymod.queries()
        t0 = time.perf_counter()
        n = queries["label_communities"](spark, sf_dir).count()
        mark("final_sizes_join_count")
        total = round(time.perf_counter() - t0, 1)
    finally:
        sess.iter_checkpoint = orig

    line = json.dumps(
        {
            "metric": "lpa_phase_profile_sec",
            "sf_dir": sf_dir,
            "rows": n,
            "total": total,
            "phases": phases,
            "note": (
                "checkpoint_1=pairs distinct; checkpoint_2=round1 (incl. "
                "adjacency build+persist materialization); checkpoint_3/4="
                "vote rounds 2/3 (each incl. its label broadcast build in "
                "the gather regime); the bounds agg is charged to "
                "checkpoint_3's span (it runs between round 1 and round 2)."
            ),
        }
    )
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
