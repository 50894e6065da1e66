"""Regenerate REGISTRY.md from the live registry: every ``queries()`` entry
with its implementation anchor (module:line via inspect), grouped by module.

Usage: python tools/gen_registry.py   (writes REGISTRY.md in-place)
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, ".")

_SECTIONS = [
    ("gmall_spark/queries.py", "Core warehouse + relational (queries.py)"),
    ("gmall_spark/queries_tpch.py", "TPC-H-shape completion (queries_tpch.py)"),
    ("gmall_spark/extras/queries.py", "LLM-data-pipeline extras (extras/queries.py)"),
    ("gmall_spark/extras/graph.py", "Graph analytics (extras/graph.py)"),
    ("gmall_spark/streaming/queries.py", "Live Structured Streaming (streaming/queries.py)"),
]

_HEADER = """# Registry index — every `queries()` entry and where it lives

Generated audit map (`python tools/gen_registry.py`): each of the registry's
{n} entries has BOTH a Spark implementation and a DuckDB oracle
(`oracle_sql()`) unless marked rows-only, and the driver value-hash-compares
them at sf0.01. Implementation anchors below are `module:line` within
`gmall_spark/`.
"""


def main() -> None:
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    rows: dict[str, list[tuple[str, int, str]]] = {m: [] for m, _ in _SECTIONS}
    for name, fn in qs.items():
        f = inspect.unwrap(fn)
        path = os.path.relpath(inspect.getsourcefile(f))
        line = inspect.getsourcelines(f)[1]
        rel = path.split("gmall_spark/", 1)[-1] if "gmall_spark/" in path else path
        rows.setdefault(path, []).append((name, line, rel))

    out = [_HEADER.format(n=len(qs))]
    for mod, title in _SECTIONS:
        entries = sorted(rows.get(mod, []))
        out.append(f"\n## {title} — {len(entries)} entries\n")
        out.append("| entry | impl |")
        out.append("|---|---|")
        for name, line, rel in entries:
            tag = "" if name in oracles else " (rows-only)"
            out.append(f"| `{name}` | `{rel}:{line}`{tag} |")
    covered = {n for m, _ in _SECTIONS for n, _, _ in rows.get(m, [])}
    stray = sorted(set(qs) - covered)
    if stray:
        out.append("\n## Unsectioned entries (add module to _SECTIONS)\n")
        for n in stray:
            out.append(f"- `{n}`")
    with open("REGISTRY.md", "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"REGISTRY.md: {len(qs)} entries, {len(oracles)} with oracles")


if __name__ == "__main__":
    main()
