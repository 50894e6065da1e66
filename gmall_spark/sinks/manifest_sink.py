"""`gmall_manifest` — a native Python DataSource SINK (Spark 4
`pyspark.sql.datasource` writer API) with manifest-gated atomic visibility.

The problem it demonstrates is the real one every file sink has: a failed
job must not leave readers seeing half its output. The fix is the pattern
Delta/Iceberg build on — tasks stage files, the DRIVER commits a manifest,
readers trust only the manifest:

- `write(iterator)` (executor, once per task): serialize rows to JSONL in
  `<path>/_staged/part-<uuid>.jsonl`, return a commit message naming the
  file and its row count. A retried task stages a second file; only the
  attempt whose message reaches `commit` is ever published.
- `commit(messages)` (driver, all tasks succeeded): atomically publish by
  writing `_MANIFEST.json` listing exactly the staged files of the
  successful attempts (os.replace — readers see the old manifest or the
  new one, never a torn one).
- `abort(messages)` (driver, any task failed): delete the staged files;
  the manifest is untouched, so readers never observed the failed write.
- Streaming (`DataSourceStreamWriter`): the manifest maps batchId → files.
  A replayed micro-batch (same batchId after crash-restart) REPLACES its
  entry — exactly-once at file granularity, the idempotent-foreachBatch
  contract implemented inside the connector instead of around it.

`read_manifested` is the reader side: load only manifested files. Orphaned
staged files from killed attempts are invisible garbage, cleaned by
`vacuum_staged`.

Scale note: staging is per-task and parallel; the only driver-side work is
the message list (one tuple per task) and one manifest write — the same
O(tasks) commit cost as any table format. Local-path staging maps to the
object-store layout unchanged (staged keys + one manifest object).
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class StagedFile(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


def _stage_rows(base: str, it: Iterator) -> StagedFile:
    staged_dir = os.path.join(base, "_staged")
    os.makedirs(staged_dir, exist_ok=True)
    fpath = os.path.join(staged_dir, f"part-{uuid.uuid4().hex}.jsonl")
    n = 0
    with open(fpath, "w", encoding="utf-8") as fh:
        for row in it:
            fh.write(json.dumps(row.asDict(recursive=True), default=str) + "\n")
            n += 1
    return StagedFile(fpath, n)


def _manifest_path(base: str) -> str:
    return os.path.join(base, "_MANIFEST.json")


def _load_manifest(base: str) -> dict:
    try:
        with open(_manifest_path(base), encoding="utf-8") as fh:
            return json.load(fh)
    except FileNotFoundError:
        return {"batches": {}}


def _store_manifest(base: str, manifest: dict) -> None:
    tmp = _manifest_path(base) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(base))  # atomic publish


class GmallManifestWriter(DataSourceWriter):
    def __init__(self, options):
        self.base = options.get("path")
        if not self.base:
            raise ValueError("gmall_manifest requires a path")

    def write(self, iterator) -> StagedFile:
        return _stage_rows(self.base, iterator)

    def commit(self, messages) -> None:
        manifest = _load_manifest(self.base)
        files = [
            {"path": m.path, "rows": m.rows} for m in messages if m is not None
        ]
        # batch API: one logical commit; key "batch" distinguishes from
        # streaming epochs and repeated batch saves append new commits
        key = f"batch-{len(manifest['batches'])}"
        manifest["batches"][key] = files
        _store_manifest(self.base, manifest)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class GmallManifestStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.base = options.get("path")
        if not self.base:
            raise ValueError("gmall_manifest requires a path")

    def write(self, iterator) -> StagedFile:
        return _stage_rows(self.base, iterator)

    def commit(self, messages, batchId: int) -> None:
        manifest = _load_manifest(self.base)
        old = manifest["batches"].get(str(batchId))
        if old:
            # crash-replayed epoch: the previous attempt's files are
            # superseded, not duplicated — delete and replace
            for f in old:
                if os.path.exists(f["path"]):
                    os.remove(f["path"])
        manifest["batches"][str(batchId)] = [
            {"path": m.path, "rows": m.rows} for m in messages if m is not None
        ]
        _store_manifest(self.base, manifest)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class GmallManifestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "gmall_manifest"

    def writer(self, schema, overwrite: bool) -> GmallManifestWriter:
        return GmallManifestWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> GmallManifestStreamWriter:
        return GmallManifestStreamWriter(self.options)


def register_manifest_sink(spark) -> None:
    spark.dataSource.register(GmallManifestDataSource)


def manifested_files(base: str) -> list[dict]:
    """Every committed file across batches, manifest order."""
    out = []
    for _, files in sorted(_load_manifest(base)["batches"].items()):
        out.extend(files)
    return out


def read_manifested(spark, base: str, schema: str):
    """Reader side of the contract: only manifested files exist."""
    files = [f["path"] for f in manifested_files(base)]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)


def vacuum_staged(base: str) -> int:
    """Delete staged files no manifest references (failed/killed attempts);
    returns the count removed."""
    keep = {f["path"] for f in manifested_files(base)}
    staged_dir = os.path.join(base, "_staged")
    removed = 0
    if os.path.isdir(staged_dir):
        for f in os.listdir(staged_dir):
            p = os.path.join(staged_dir, f)
            if p not in keep:
                os.remove(p)
                removed += 1
    return removed
