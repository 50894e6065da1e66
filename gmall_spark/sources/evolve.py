"""Schema evolution at the ingestion edge.

A long-lived lake never has one schema: upstream CDC adds columns, widens
ints to longs, and old files stay as written. Spark's `mergeSchema` unions
COLUMN SETS but refuses primitive-type conflicts (int vs long fails to
merge), so a real pipeline needs an explicit widening step: decide the
unified target schema, cast every source frame to it, and fail loudly on
genuinely incompatible or narrowing drift instead of silently truncating.

This module is that step, DataFrame-side (no file-footer scanning — pair it
with per-schema-epoch reads: each epoch's files share a schema, read each
epoch with its own explicit schema, then `unify_frames` the epochs; schema
epochs are O(number of ALTERs), not O(files), so the driver-side work here
is bounded no matter how many files the lake holds).

Widening is the SQL numeric tower only — byte < short < int < long < float
< double — plus date < timestamp. Everything else (string vs numeric,
decimal precision changes, struct drift) raises: those are contract breaks
a pipeline must surface, not paper over. All casts are plan-side
(`Column.cast`), so the whole evolution is codegen — no UDF, no extra pass.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the widening chain: index = rank; a cast is legal only up-rank
_NUMERIC_TOWER = [
    T.ByteType(),
    T.ShortType(),
    T.IntegerType(),
    T.LongType(),
    T.FloatType(),
    T.DoubleType(),
]
_TEMPORAL_TOWER = [T.DateType(), T.TimestampType()]


def _rank(dt: T.DataType, tower: list[T.DataType]) -> int | None:
    for i, t in enumerate(tower):
        if dt == t:
            return i
    return None


def widen(a: T.DataType, b: T.DataType) -> T.DataType:
    """The narrowest type both `a` and `b` widen to, or raise."""
    if a == b:
        return a
    for tower in (_NUMERIC_TOWER, _TEMPORAL_TOWER):
        ra, rb = _rank(a, tower), _rank(b, tower)
        if ra is not None and rb is not None:
            return tower[max(ra, rb)]
    raise TypeError(f"incompatible schema drift: {a.simpleString()} vs {b.simpleString()}")


def unified_schema(*schemas: T.StructType) -> T.StructType:
    """Union of column sets, each column at its widened type; column order =
    first appearance across the inputs (stable for unionByName)."""
    out: dict[str, T.DataType] = {}
    for s in schemas:
        for f in s.fields:
            out[f.name] = widen(out[f.name], f.dataType) if f.name in out else f.dataType
    return T.StructType([T.StructField(n, t, True) for n, t in out.items()])


def evolve_to(df: DataFrame, target: T.StructType) -> DataFrame:
    """Cast `df` to `target`: widen existing columns (narrowing raises via
    `widen`), add missing columns as typed NULLs, keep target column order.
    Columns of `df` absent from `target` raise — dropping data silently is
    the one thing an ingestion edge must never do (project first if meant)."""
    have = {f.name: f.dataType for f in df.schema.fields}
    extra = set(have) - {f.name for f in target.fields}
    if extra:
        raise ValueError(f"columns not in target schema (project them away first): {sorted(extra)}")
    cols = []
    for f in target.fields:
        if f.name in have:
            if widen(have[f.name], f.dataType) != f.dataType:
                raise TypeError(
                    f"target narrows column {f.name}: "
                    f"{have[f.name].simpleString()} -> {f.dataType.simpleString()}"
                )
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def unify_frames(*frames: DataFrame) -> DataFrame:
    """Evolve every frame to the common widened schema and union them —
    the read path for a lake with schema epochs."""
    if not frames:
        raise ValueError("no frames")
    target = unified_schema(*(f.schema for f in frames))
    return reduce(lambda a, b: a.unionByName(b), (evolve_to(f, target) for f in frames))
