"""`gmall_logs` — a native Python DataSource (Spark 4 `pyspark.sql.datasource`
API) for the reference's behavior-log landing directory.

The reference ingests behavior logs over HTTP into Kafka
(gmall2021-logger `LoggerController.java:31-42` → topic `ods_base_log`); the
broker-less deployment analog is a landing directory of JSON-lines files
named `log-YYYY-MM-DD*.jsonl`. Spark's built-in json reader handles the
payload fine — what it can NOT do is (a) prune files by the day encoded in
the filename when the query filters on it, or (b) expose the directory as a
streaming source with an explicit, inspectable offset protocol. This source
does both, as a first-class connector:

- **Batch** (`spark.read.format("gmall_logs").load(dir)`): one
  InputPartition per file (the scalable task unit — a 100 TB landing zone
  is many files, not big ones), schema `line STRING, src_file STRING,
  day STRING`. `pushFilters` accepts EqualTo/In/comparison filters on
  `day` and prunes WHOLE FILES at planning time — partition pruning for a
  layout the built-in reader sees as opaque filenames. All other filters
  are returned to Spark unchanged (the source never half-applies a
  predicate).
- **Streaming** (`spark.readStream.format("gmall_logs")`): files are the
  log's append-only segments; the offset is the count of files in sorted-
  name order (the same contract as Kafka segment offsets: names must be
  monotonic, which day-stamped log names are). `initialOffset` = 0,
  `latestOffset` = current file count, `partitions(start, end)` = one per
  new file; `commit` is a no-op because the landing zone is immutable.

Rows stay RAW (`line`): decoding belongs to the engine's parse layer
(`operators/parse.py::parse_json_with_dirty` — same dirty-data side-output
semantics as BaseLogApp.java:45-55), so the source composes with the
existing DWD pipeline instead of duplicating it.
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)
from pyspark.sql.types import StructType

_SCHEMA = "line string, src_file string, day string"
_DAY_RE = re.compile(r"(\d{4}-\d{2}-\d{2})")


def _day_of(path: str) -> str | None:
    """Day stamp from the FULL path — matches both flat landing names
    (log-2024-01-01.jsonl) and Hive-partitioned dirs (day=2024-01-01/...)."""
    m = _DAY_RE.search(path)
    return m.group(1) if m else None


_SUFFIXES = (".jsonl", ".json", ".log", ".txt")


def _list_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(_SUFFIXES) and not f.startswith((".", "_")):
                out.append(os.path.join(root, f))
    return sorted(out)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _read_file(part: _FilePartition) -> Iterator[tuple]:
    day = _day_of(part.path)
    with open(part.path, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line:
                yield (line, part.path, day)


class GmallLogsReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("gmall_logs requires a path (.load(dir))")
        self.days: set[str] | None = None  # None = no pruning

    def pushFilters(self, filters: Sequence[Filter]) -> Iterator[Filter]:
        for f in filters:
            # only whole-file-decidable predicates on `day` are consumed;
            # everything else goes back to Spark untouched
            if isinstance(f, EqualTo) and f.attribute == ("day",):
                self.days = {f.value} if self.days is None else self.days & {f.value}
            elif isinstance(f, In) and f.attribute == ("day",):
                vals = set(f.value)
                self.days = vals if self.days is None else self.days & vals
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        files = _list_files(self.path)
        if self.days is not None:
            files = [f for f in files if _day_of(f) in self.days]
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        return _read_file(partition)


class GmallLogsStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("gmall_logs requires a path (.load(dir))")

    def initialOffset(self) -> dict:
        return {"file_count": 0}

    def latestOffset(self) -> dict:
        return {"file_count": len(_list_files(self.path))}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        files = _list_files(self.path)
        return [_FilePartition(f) for f in files[start["file_count"] : end["file_count"]]]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        return _read_file(partition)

    def commit(self, end: dict) -> None:
        pass  # landing zone is immutable; nothing to release

    def stop(self) -> None:
        pass


class GmallLogsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "gmall_logs"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> GmallLogsReader:
        return GmallLogsReader(self.options)

    def streamReader(self, schema: StructType) -> GmallLogsStreamReader:
        return GmallLogsStreamReader(self.options)


def register_log_source(spark) -> None:
    """Idempotent `spark.dataSource.register` of the connector; also flips
    the Python-source pushdown conf the day-pruning depends on (off by
    default in Spark 4.1 — without it, planning fails fast on any reader
    that implements pushFilters)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(GmallLogsDataSource)
