"""Multimodal plumbing: binary columns, frame explosion, embedder stub →
similarity pipeline composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_spark.extras import multimodal, similarity
from gmall_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_assets_schema_and_features(spark):
    docs = load_table(spark, SF, "documents")
    assets = multimodal.to_assets(docs, "doc_id", "text")
    feats = multimodal.extract_features(assets)
    row = feats.first()
    assert row["n_bytes"] > 0 and len(row["features"]) == 4
    assert feats.count() == docs.count()


def test_frame_sampling_explodes_rows(spark):
    docs = load_table(spark, SF, "documents")
    assets = multimodal.to_assets(docs, "doc_id", "text")
    frames = multimodal.sample_frames(assets, frame_size=64, stride=2)
    n_assets = assets.count()
    n_frames = frames.count()
    assert n_frames > n_assets  # genuine row explosion
    # deterministic: same input → same frames
    assert frames.count() == multimodal.sample_frames(assets, 64, 2).count()
    # per-frame sizes bounded by frame_size
    assert frames.filter(F.col("n_bytes") > 64).count() == 0


def test_embedder_to_knn_pipeline(spark):
    """text → embedding → exact kNN: the composed training-data pipeline."""
    docs = load_table(spark, SF, "documents")
    emb = multimodal.fake_text_embedder(docs, "doc_id", "text", dims=16)
    knn = similarity.brute_force_knn(emb, "doc_id", "embedding", k=3)
    n = docs.count()
    assert knn.count() == 3 * n
    # identical texts must be each other's rank-1 neighbors (cosine 1.0):
    # dedup_exact found duplicate texts in documents
    from gmall_spark.extras.dedup import exact

    dups = exact(docs, "doc_id", "text").filter(F.col("dup_ct") > 1)
    if dups.count() > 0:
        pair = dups.first()
        keep = pair["keep_id"]
        top1 = {r["neighbor_id"] for r in knn.filter(
            (F.col("vec_id") == keep) & (F.col("rnk") == 1)).collect()}
        # its duplicate should be the nearest neighbor
        same_hash_ids = [r["doc_id"] for r in docs.select("doc_id", F.md5("text").alias("h"))
                         .join(dups.select(F.col("content_hash").alias("h")), "h").collect()]
        assert top1 <= set(same_hash_ids)


def test_decode_real_is_explicitly_stubbed():
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.decode_real(b"bytes", "image")


def test_resize_bounds_output_size(spark):
    """Resize: every output payload is exactly width*height bytes no matter
    the input size, and meta reflects the new geometry."""
    docs = load_table(spark, SF, "documents")
    assets = multimodal.to_assets(docs, "doc_id", "text")
    small = multimodal.resize(assets, width=8, height=8)
    rows = small.collect()
    assert all(len(r["payload"]) == 64 for r in rows)
    assert all(r["meta"]["width"] == 8 and r["meta"]["n_bytes"] == 64 for r in rows)
    # deterministic
    again = {r["asset_id"]: bytes(r["payload"]) for r in multimodal.resize(assets, 8, 8).collect()}
    assert all(bytes(r["payload"]) == again[r["asset_id"]] for r in rows)
