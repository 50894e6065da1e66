"""gmall_manifest sink: manifest-gated atomic visibility (batch), replayed-
epoch idempotency (streaming), abort invisibility, vacuum."""

import json
import os

from pyspark.sql import functions as F

from gmall_spark.sinks.manifest_sink import (
    GmallManifestStreamWriter,
    StagedFile,
    manifested_files,
    read_manifested,
    register_manifest_sink,
    vacuum_staged,
)


def test_batch_write_publishes_manifest(spark, tmp_path):
    register_manifest_sink(spark)
    out = str(tmp_path / "sink")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    df.coalesce(4).write.format("gmall_manifest").mode("append").option("path", out).save()
    files = manifested_files(out)
    assert sum(f["rows"] for f in files) == 100
    assert len(files) == 4
    back = read_manifested(spark, out, "id long, k long")
    assert back.count() == 100
    assert back.agg(F.sum("id")).first()[0] == 4950


def test_unmanifested_staging_is_invisible_and_vacuumable(spark, tmp_path):
    register_manifest_sink(spark)
    out = str(tmp_path / "sink")
    spark.range(10).coalesce(1).write.format("gmall_manifest").mode("append").option("path", out).save()
    # simulate a killed attempt: orphan staged file, never manifested
    orphan = os.path.join(out, "_staged", "part-deadbeef.jsonl")
    with open(orphan, "w") as fh:
        fh.write('{"id": 999}\n')
    back = read_manifested(spark, out, "id long")
    assert back.count() == 10  # orphan invisible
    assert vacuum_staged(out) == 1
    assert not os.path.exists(orphan)
    # manifested files survive the vacuum
    assert read_manifested(spark, out, "id long").count() == 10


def test_streaming_epochs_and_replay_idempotency(spark, tmp_path):
    """A replayed micro-batch (same batchId) must replace its manifest
    entry, not duplicate rows — the exactly-once contract."""
    register_manifest_sink(spark)
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text('{"id": 1}\n{"id": 2}\n')
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.schema("id long")
            .json(str(src))
            .writeStream.format("gmall_manifest")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    n1 = sum(f["rows"] for f in manifested_files(out))
    assert n1 == 2
    (src / "b.json").write_text('{"id": 3}\n')
    drain()
    total = sum(f["rows"] for f in manifested_files(out))
    assert total == 3  # second epoch added only the new file's rows
    # replay epoch 1 manually (crash-after-write, commit re-delivered):
    w = GmallManifestStreamWriter({"path": out})
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    replay_id = sorted(int(k) for k in manifest["batches"])[-1]
    staged = os.path.join(out, "_staged", "part-replay.jsonl")
    with open(staged, "w") as fh:
        fh.write('{"id": 3}\n')
    w.commit([StagedFile(staged, 1)], replay_id)
    total2 = sum(f["rows"] for f in manifested_files(out))
    assert total2 == 3  # replaced, not duplicated
    assert read_manifested(spark, out, "id long").count() == 3


def test_abort_leaves_no_trace(spark, tmp_path):
    from gmall_spark.sinks.manifest_sink import GmallManifestWriter

    out = str(tmp_path / "sink")
    os.makedirs(os.path.join(out, "_staged"), exist_ok=True)
    staged = os.path.join(out, "_staged", "part-x.jsonl")
    with open(staged, "w") as fh:
        fh.write('{"id": 1}\n')
    GmallManifestWriter({"path": out}).abort([StagedFile(staged, 1)])
    assert not os.path.exists(staged)
    assert manifested_files(out) == []
