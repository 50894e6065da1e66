"""Batch sinks (SURVEY §2.2). Streaming counterparts (foreachBatch JDBC,
dynamic-topic Kafka, memory/console) live in streaming/pipelines.py.

K3 — the reference's ClickHouse sink reflects over bean fields, skips
@TransientSink-annotated ones, and batches 5 rows (ClickhouseUtil.java:16-66).
Here: drop the transient columns explicitly and let the JDBC writer batch per
partition — column selection replaces reflection, partition-sized batches
replace the magic 5.

K2/K5 — dynamic routing to per-table outputs: in batch, partitionBy on the
routing column gives one directory per sink table in a single pass (no
per-table job), the columnar analog of the reference's per-record topic
routing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, partition_by: Sequence[str] = (), mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_routed_parquet(routed: DataFrame, base_path: str) -> None:
    """K2 batch analog: one pass, one directory per sink_table value.
    At scale this is a single shuffle-free write (router column is computed,
    not shuffled) — no N jobs for N destinations."""
    routed.write.mode("overwrite").partitionBy("sink_table").parquet(base_path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    transient_cols: Sequence[str] = (),
    batchsize: int = 10000,
    **opts: str,
) -> None:
    """K3 — JDBC batch write minus transient columns. batchsize is the real
    per-round-trip row count (the reference's 5 would be a disaster at scale)."""
    out = df.drop(*transient_cols) if transient_cols else df
    (
        out.write.mode("append")
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .options(**opts)
        .save()
    )


def swap_parquet_dirs(spark, path: str, tmp: str, old: str) -> None:
    """Atomic directory replacement for in-place rewrites (compaction,
    re-layout): os.rename is atomic on a posix filesystem (shutil.move may
    degrade to copy+delete across devices); the new tree must read back
    before the backup is dropped, so a failure at any step leaves a
    recoverable copy. Callers must have already refused leftover tmp/old
    dirs (re-entrancy guard)."""
    import os
    import shutil

    os.rename(path, old)
    try:
        os.rename(tmp, path)
        spark.read.parquet(path).head(1)
    except BaseException:
        # put the original back if the swap or verification failed
        if not os.path.exists(path) and os.path.exists(old):
            os.rename(old, path)
        raise
    shutil.rmtree(old)


def swap_parquet_dirs_copy(spark, path: str, tmp: str, old: str) -> None:
    """Object-store-safe directory replacement — the copy-then-verify-then-
    delete variant: S3/GCS-style stores have no rename (a 'rename' there is
    a non-atomic copy+delete per object), so this uses only the object-store
    primitive ops — list, copy, delete — never os.rename/shutil.move:

      1. copy path → old          (backup BEFORE the destination is touched)
      2. delete path contents, copy tmp → path
      3. read path back           (verify BEFORE any delete of a source)
      4. delete old + tmp

    A failure at/after step 2 restores from `old` when possible; if the
    restore itself fails, `old` survives as the authoritative copy and the
    caller's re-entrancy guard refuses the next run until resolved — the
    same recovery contract as the posix rename variant, minus atomicity of
    the final swap (the unavoidable object-store trade; compaction runs in
    a maintenance window with writers quiesced by definition)."""
    import os
    import shutil

    shutil.copytree(path, old)
    try:
        for entry in os.listdir(path):
            p = os.path.join(path, entry)
            shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
        for entry in os.listdir(tmp):
            src, dst = os.path.join(tmp, entry), os.path.join(path, entry)
            shutil.copytree(src, dst) if os.path.isdir(src) else shutil.copyfile(src, dst)
        spark.read.parquet(path).head(1)
    except BaseException:
        try:  # restore the original contents from the backup
            for entry in os.listdir(path):
                p = os.path.join(path, entry)
                shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
            for entry in os.listdir(old):
                src, dst = os.path.join(old, entry), os.path.join(path, entry)
                shutil.copytree(src, dst) if os.path.isdir(src) else shutil.copyfile(src, dst)
            shutil.rmtree(old)
            # a CLEAN restore must also clear `tmp`, or the re-entrancy
            # guard refuses every later compaction run for a failure that
            # was already recovered; only a failed restore leaves both
            shutil.rmtree(tmp, ignore_errors=True)
        except BaseException:
            pass  # leave `old` (and `tmp`) in place — the guard takes over
        raise
    shutil.rmtree(old)
    shutil.rmtree(tmp)


def compact_parquet(
    spark,
    path: str,
    target_mb: int = 256,
    partition_by: Sequence[str] = (),
    swap: str = "rename",
) -> int:
    """Small-files compaction — the maintenance op every long-running
    partitioned sink needs at scale: streaming micro-batches and routed
    writes leave thousands of KB-sized files per directory, and at 100 TB
    the NameNode/listing pressure plus per-file open cost dominate reads.

    Rewrites ``path`` so files are ~``target_mb``: sizes the shuffle from
    the ACTUAL byte size on disk (not row counts), writes to a sibling
    temp dir, then swaps directories. Returns the output file count.
    ``swap="rename"`` (default) is the atomic posix path
    (swap_parquet_dirs); ``swap="copy"`` is the object-store-safe
    copy-then-verify-then-delete path (swap_parquet_dirs_copy) for
    filesystems without rename.

    repartition (not coalesce): coalesce collapses upstream parallelism
    into the merged tasks; a shuffle-repartition keeps the read parallel
    and balances output file sizes.

    With ``partition_by`` the shuffle is on the partition columns plus a
    derived file-index column — NOT a random round-robin: a random
    repartition(n) hands every task rows from many Hive partition values,
    so each task writes one file per value it holds and the "compacted"
    sink can end up with MORE small files (up to n × |values|) than it
    started with. Keying the shuffle by (partition cols, index) pins each
    output file to exactly one partition directory.
    """
    import math
    import os
    import shutil

    from pyspark.sql import functions as F

    tmp = path.rstrip("/") + "__compacting"
    old = path.rstrip("/") + "__old"
    # Re-entrancy: leftovers from a crashed prior run change move semantics
    # (moving into an existing dir NESTS the source), after which the rmtree
    # below would delete the only surviving copy. Refuse until a human (or
    # recovery tooling) has resolved which copy is authoritative.
    for leftover in (tmp, old):
        if os.path.exists(leftover):
            raise RuntimeError(
                f"compact_parquet: leftover {leftover!r} from a previous "
                "failed run — resolve it (restore or delete) before re-running"
            )

    total_bytes = sum(
        os.path.getsize(os.path.join(dirpath, f))
        for dirpath, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if partition_by:
        # Files per partition directory, sized from the global byte total
        # spread over the leaf directories actually present on disk. Skewed
        # partition values get files above/below target_mb but the file
        # COUNT stays bounded at files_per_dir per directory.
        n_dirs = sum(
            1
            for dirpath, _, files in os.walk(path)
            if any(f.endswith(".parquet") for f in files)
        )
        files_per_dir = max(1, math.ceil(n_files / max(1, n_dirs)))
        hash_cols = [c for c in df.columns if c not in partition_by] or list(df.columns)
        idx = F.pmod(F.abs(F.hash(*hash_cols)), F.lit(files_per_dir))
        shuffled = df.repartition(*partition_by, idx.alias("_file_idx"))
        w = shuffled.write.mode("overwrite").partitionBy(*partition_by)
    else:
        w = df.repartition(n_files).write.mode("overwrite")
    w.parquet(tmp)
    if swap == "copy":
        swap_parquet_dirs_copy(spark, path, tmp, old)
    elif swap == "rename":
        swap_parquet_dirs(spark, path, tmp, old)
    else:
        raise ValueError(f"swap must be 'rename' or 'copy', got {swap!r}")
    return sum(
        1
        for _, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Z-order (Morton) layout write — multi-column data skipping for scans
    that filter on ANY of ``cols``, not just a lexicographic prefix.
    Delegates to the canonical implementation in operators/layout.py
    (quantize → static bit-interleave expression → repartitionByRange +
    local sort; no UDF, no driver-side data movement beyond the 2k bound
    scalars)."""
    from gmall_spark.operators.layout import write_zordered

    write_zordered(df, path, cols, n_files=n_files, bits=bits)
