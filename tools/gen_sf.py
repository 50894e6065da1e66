#!/usr/bin/env python
"""Scale-up generator: build sfN testdata by replicating the driver's sf0.1
tables K times with consistent key offsets — referential integrity preserved
(lineitem's order/part/supp keys shift together with their parents; events'
user_id shifts with customer), replica 0 is the untouched original.

Purpose: the per-round bench at sf0.1 is fixed-overhead-dominated (most
queries 0.2-6 s), so it proves plan SHAPE, not scaling. A 10x corpus makes
shuffle sizes, AQE decisions (broadcast thresholds, skew splits), and the
dedup/ANN bucketing actually move. This is bench input only — the DuckDB
correctness gate stays on the driver's own sf0.01.

Two content rules keep scaled behavior realistic instead of degenerate:
- documents: every other token of replica i>0 is tagged `~i`, pushing
  cross-replica Jaccard to ~1/3 (below the 50% near-dup threshold) — near-dup
  structure grows linearly with scale instead of every doc becoming a
  100-member cross-replica clique;
- embeddings: replica i>0 vectors get a small deterministic perturbation on
  dimension (i mod dim), so no exact-duplicate vectors.

Usage: python tools/gen_sf.py [out_dir] [factor] [--src DIR] [--tables a,b,...]
(defaults: .localdata/sf1 10 --src /root/testdata/sf0.1, all tables)

--src lets a second decade be built from an already-scaled dir (sf10 x10 =
sf100) instead of a 1000-way replication of sf0.1; key offsets are computed
from the source dir's own parent domains, so referential integrity holds
regardless of which decade the source is. --tables restricts output to the
named fact tables (dims are always copied) — an sf100 probe that only reads
documents+lineitem shouldn't pay for 600M events rows it never scans.

The `~i` document-token tag uses the REPLICA index, so a two-decade build
(sf10 x10) reuses tags 1-9 on top of source rows already tagged 1-9: token
`foo~3~7` appears only in sf100 replica 7 of sf10 replica 3 — still unique
per lineage, cross-replica Jaccard still ~1/3.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# table -> {column: parent} key groups that must shift together; the offset
# unit for a group is (max key of the parent domain at sf0.1) + 1
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "customer"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
DOMAIN_KEY = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _mutate_texts(texts: list[str | None], i: int) -> list[str | None]:
    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        toks = t.split(" ")
        out.append(
            " ".join(
                f"{tok}~{i}" if (j + i) % 2 == 0 else tok
                for j, tok in enumerate(toks)
            )
        )
    return out


def main() -> None:
    argv = list(sys.argv[1:])
    src_dir, tables = SRC, None
    if "--src" in argv:
        i = argv.index("--src")
        src_dir = argv[i + 1]
        del argv[i : i + 2]
    if "--tables" in argv:
        i = argv.index("--tables")
        tables = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    out_dir = argv[0] if argv else ".localdata/sf1"
    factor = int(argv[1]) if len(argv) > 1 else 10
    os.makedirs(out_dir, exist_ok=True)

    keyed = {n: k for n, k in KEYED.items() if tables is None or n in tables}
    # offsets only for domains some selected table actually shifts by
    needed_doms = {parent for keys in keyed.values() for parent in keys.values()}
    offsets = {
        dom: pq.read_table(
            os.path.join(src_dir, f"{dom}.parquet"), columns=[key]
        )[key].to_numpy().max() + 1
        for dom, key in DOMAIN_KEY.items()
        if dom in needed_doms
    }

    for name in ("region", "nation"):  # dims don't scale
        src = os.path.join(src_dir, f"{name}.parquet")
        pq.write_table(pq.read_table(src), os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: copied")

    for name, keys in keyed.items():
        src = pq.read_table(os.path.join(src_dir, f"{name}.parquet"))
        dest = os.path.join(out_dir, f"{name}.parquet")
        writer = pq.ParquetWriter(dest, src.schema)
        for i in range(factor):
            cols = {}
            for col in src.schema.names:
                arr = src[col]
                if i and col in keys:
                    off = int(offsets[keys[col]]) * i
                    arr = pa.chunked_array(
                        [pa.compute.add(c, off) for c in arr.chunks]
                    )
                elif i and name == "documents" and col == "text":
                    arr = pa.array(_mutate_texts(arr.to_pylist(), i), type=pa.string())
                elif i and name == "embeddings" and col == "embedding":
                    import numpy as np

                    vecs = arr.to_pylist()
                    for v in vecs:
                        if v:
                            v[i % len(v)] = float(np.float32(v[i % len(v)] + 0.003 * i))
                    arr = pa.array(vecs, type=src.schema.field(col).type)
                cols[col] = arr
            # several row groups per replica: row groups are Spark's split
            # unit, and a 10-replica file with one group each caps the scan
            # at 10 tasks — real large tables have thousands of splits
            writer.write_table(
                pa.table(cols, schema=src.schema),
                row_group_size=max(1024, len(src) // 8),
            )
        writer.close()
        meta = pq.read_metadata(dest)
        print(f"{name}: {meta.num_rows} rows ({factor}x)")


if __name__ == "__main__":
    main()
