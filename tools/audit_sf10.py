#!/usr/bin/env python
"""Full-registry scale audit: run every BATCH entry at a scaled dir and
record wall/rows/failure per entry. The r6 motivation: bfs_hops OOM'd at
sf10 under the default heap and no probe had ever covered it — headline
probes sample, this sweeps. Streaming entries are excluded (they have
their own sf10 probe artifacts and cost 100-200s each per-key by design).

Usage: python tools/audit_sf10.py [sf_dir] [out.json] [name ...]
Progress goes to stderr per entry, so a hang identifies its entry. With
explicit names, only those entries run and the out.json is MERGED over the
existing artifact (append/refresh rows without re-running the full sweep —
for entries added after a sweep started, or for solo re-times).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _failure_reason(exc: Exception) -> str:
    """First line of the exception, plus — when the failure surfaced inside
    a Python worker and the headline is Py4J boilerplate — the deepest
    `SomethingError: ...` line from the chained traceback. Two r6 artifact
    gaps drove this: Py4J messages can OPEN with a newline (recorded reason
    was ""), and worker-raised designed refusals (ValueError from a
    pinned-density guard) hid behind "An exception was thrown from the
    Python worker"."""
    text = str(exc).strip() or repr(exc)
    lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
    head = lines[0][:300]
    import re

    causes = [ln for ln in lines[1:] if re.match(r"^[\w.]*(Error|Exception)\b\s*:", ln)]
    if causes and causes[-1][:60] not in head:
        return (head[:150] + " | cause: " + causes[-1][:200])[:360]
    return head


def load_prior(out_path: str) -> dict[str, dict]:
    """Seed the results map from an existing artifact (merge mode): ok rows
    keep their sec/rows, failed rows keep their reason at sec=-1. A re-run
    of a picked entry then OVERWRITES its seeded row."""
    results: dict[str, dict] = {}
    if os.path.exists(out_path):
        prior = json.loads(open(out_path).read())
        for k, v in prior.get("queries", {}).items():
            results[k] = {"sec": v, "rows": prior.get("rows", {}).get(k)}
        for k, err in prior.get("failed", {}).items():
            results[k] = {"sec": -1.0, "error": err}
    return results


def assemble_artifact(results: dict[str, dict]) -> dict:
    ok = {k: v for k, v in results.items() if v["sec"] >= 0}
    return {
        "metric": "batch_registry_sf10_audit",
        "unit": "sec",
        "sf": 10,
        "value": round(sum(v["sec"] for v in ok.values()), 1),
        "n_ok": len(ok),
        "failed": {k: v["error"] for k, v in results.items() if v["sec"] < 0},
        "queries": {k: v["sec"] for k, v in ok.items()},
        "rows": {k: v["rows"] for k, v in ok.items()},
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf10"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "AUDIT_sf10.json"
    picked = set(sys.argv[3:])

    from gmall_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("gmall_audit_sf10")
    spark.range(1000).count()

    def recycle(s):
        """Tear the whole session down — JVM and Python worker pool — and
        start fresh. Spark reuses Python workers across queries
        (spark.python.worker.reuse), so each worker's RSS is the HIGH-WATER
        mark of every Arrow kernel it ever ran; over a ~180-entry sweep 32
        workers crept to ~4.3 GB each and, with the 16 GB driver JVM's
        ~36 GB native footprint, the host OOM killer took the gateway down
        at entry ~140 (r7 first attempt — the NDJSON preserved all finished
        rows, which is how this was diagnosed). Recycling every
        RECYCLE_EVERY entries resets both footprints; entry wall times are
        unaffected (each entry is timed cold on its own jobs)."""
        try:
            s.stop()
        except Exception:
            pass
        import time as _t

        _t.sleep(2)
        ns = get_spark("gmall_audit_sf10")
        ns.range(1000).count()
        return ns

    RECYCLE_EVERY = 25
    queries = entrymod.queries()
    names = [n for n in sorted(queries) if not n.startswith("streaming_")]
    results: dict[str, dict] = {}
    if picked:
        unknown = picked - set(names)
        if unknown:
            raise SystemExit(f"audit: unknown entries {sorted(unknown)}")
        # merge mode: start from the existing artifact, re-run only `picked`
        names = [n for n in names if n in picked]
        results.update(load_prior(out_path))
    print(f"audit: {len(names)} batch entries at {sf_dir}", file=sys.stderr, flush=True)

    # each entry appends an NDJSON line as it finishes, so a mid-sweep crash
    # (the r6 host OOM) preserves every completed entry's timing, not just
    # stderr text; the final JSON artifact is assembled from the same data.
    # Merge-mode re-runs APPEND, so a name may occur on multiple lines —
    # consumers must resolve duplicates LAST-WINS (the later line is the
    # re-run that also overwrote the row in the JSON artifact).
    ndjson_path = out_path + ".ndjson"
    with open(ndjson_path, "a" if picked else "w") as nd:
        for i, name in enumerate(names):
            if i and i % RECYCLE_EVERY == 0:
                print("audit: -- recycling session", file=sys.stderr, flush=True)
                spark = recycle(spark)
            spark.catalog.clearCache()
            print(f"audit: >> {name}", file=sys.stderr, flush=True)
            t0 = time.perf_counter()
            try:
                n = queries[name](spark, sf_dir).count()
                results[name] = {"sec": round(time.perf_counter() - t0, 3), "rows": n}
                print(f"audit: {name}: {results[name]['sec']:.3f}s ({n} rows)", file=sys.stderr, flush=True)
            except Exception as exc:
                reason = _failure_reason(exc)
                # a dead gateway (host OOM killed the JVM) must not cascade
                # bogus failures onto every later entry: probe, restart, and
                # give the entry ONE fresh-session retry so the artifact
                # records the entry's own behavior, not the crash's
                try:
                    spark.range(1).count()
                    alive = True
                except Exception:
                    alive = False
                if not alive:
                    print(f"audit: !! gateway dead after {name} — restarting", file=sys.stderr, flush=True)
                    spark = recycle(spark)
                    t0 = time.perf_counter()
                    try:
                        n = queries[name](spark, sf_dir).count()
                        results[name] = {"sec": round(time.perf_counter() - t0, 3), "rows": n}
                        print(f"audit: {name} (retry): {results[name]['sec']:.3f}s ({n} rows)", file=sys.stderr, flush=True)
                        nd.write(json.dumps({"name": name, **results[name]}) + "\n")
                        nd.flush()
                        continue
                    except Exception as exc2:
                        reason = _failure_reason(exc2)
                results[name] = {"sec": -1.0, "error": reason}
                print(f"audit: {name} FAILED: {reason}", file=sys.stderr, flush=True)
            nd.write(json.dumps({"name": name, **results[name]}) + "\n")
            nd.flush()

    line = json.dumps(assemble_artifact(results))
    with open(out_path, "w") as fh:
        fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
