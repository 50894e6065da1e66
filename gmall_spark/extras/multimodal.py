"""Multimodal columns: opaque binary payloads + typed metadata.

Design (the part that must be right at 100 TB):
- media lives in a BinaryType column next to a typed meta struct
  (schemas.MEDIA_ASSET_SCHEMA) — parquet stores it as BYTE_ARRAY, column
  pruning means scans that don't touch `payload` never read the bytes;
- decode / feature-extract runs in mapInPandas: Arrow-batched, one Python
  worker per partition, no per-row serde; batch size bounded by
  spark.sql.execution.arrow.maxRecordsPerBatch so a partition of large blobs
  can't OOM the worker;
- repartition before extraction when blob sizes are skewed (a few huge
  videos shouldn't serialize behind one task).

The actual image/audio decode is STUBBED (no codec libs in this container):
``decode_real`` raises NotImplementedError; ``extract_features`` uses a
deterministic fake (byte-statistics) so the plumbing — schema, partitioning,
UDF signature, Arrow batch shape — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "asset_id long, media_type string, n_bytes long, byte_mean double, features array<double>"
)


def to_assets(df: DataFrame, id_col: str, text_col: str, media_type: str = "image") -> DataFrame:
    """Testdata adapter: wrap a text column as a binary payload with metadata
    (real pipelines land payloads directly from object storage)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_real(payload: bytes, media_type: str):
    """The real decoder hook (PIL/torchaudio/ffmpeg live here in production).
    Stubbed: codec libraries are not available in this environment."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this container; "
        "extract_features uses the deterministic byte-statistics fake"
    )


def extract_features(assets: DataFrame, n_features: int = 4) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas.

    Deterministic fake features (byte statistics) stand in for the decoder;
    the Spark-side contract — batch iterator in, batch iterator out, explicit
    output schema — is exactly what a real CNN/fft featurizer uses.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            byte_mean = payloads.map(lambda b: (sum(b) / len(b)) if len(b) else 0.0)
            feats = payloads.map(
                lambda b: [float(sum(b[i::n_features]) % 997) for i in range(n_features)]
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes,
                    "byte_mean": byte_mean,
                    "features": feats,
                }
            )

    return assets.mapInPandas(op, FEATURE_SCHEMA)


FRAME_SCHEMA = "asset_id long, frame_idx int, frame binary, n_bytes long"


def sample_frames(assets: DataFrame, frame_size: int = 64, stride: int = 2) -> DataFrame:
    """Frame sampling: one binary payload → 0..n frame rows (every `stride`-th
    fixed-size chunk). The real decoder would emit decoded frames at
    timestamps; the chunking fake keeps the ROW-EXPLOSION plumbing real —
    output cardinality multiplies, so this runs in mapInPandas where a batch
    can emit more rows than it received, and downstream partitioning must
    assume frames-per-asset skew (a 2h video vs a 6s clip).
    """
    import pandas as pd

    def op(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids, idxs, frames, sizes = [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                chunks = [
                    payload[off : off + frame_size]
                    for off in range(0, len(payload), frame_size)
                ]
                for i, ch in enumerate(chunks[::stride]):
                    ids.append(aid)
                    idxs.append(i)
                    frames.append(ch)
                    sizes.append(len(ch))
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "frame": frames, "n_bytes": sizes}
            )

    return assets.select("asset_id", "payload").mapInPandas(op, FRAME_SCHEMA)


def fake_text_embedder(df: DataFrame, id_col: str, text_col: str, dims: int = 16) -> DataFrame:
    """Deterministic text→embedding stub (the sentence-transformer slot):
    the vector is the centered byte expansion of md5(text) — identical text ⇒
    identical vector, engine-portable (a SQL oracle recomputes it digit by
    digit), and built from JVM expressions only, so the stub itself costs no
    Python at all. A real model swaps in as a mapInPandas stage with the
    same (id, embedding array<float>) contract — loaded once per worker in
    the generator prologue, NOT per batch (see extract_features for the
    batch-iterator shape)."""
    assert dims <= 16, "one md5 yields 16 bytes; chain salted digests for more"
    h = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    vec = F.array(
        *[
            (F.conv(F.substring(h, 2 * d + 1, 2), 16, 10).cast("double") - 127.5).cast(
                "float"
            )
            for d in range(dims)
        ]
    )
    return df.select(F.col(id_col), vec.alias("embedding"))


RESIZED_SCHEMA = (
    "asset_id long, media_type string, payload binary, "
    "meta struct<mime:string,width:int,height:int,duration_ms:bigint,n_bytes:bigint>"
)


def resize(assets: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Resize/transcode: payload in → fixed-dimension payload out with meta
    updated to the new geometry. The deterministic fake maps the input bytes
    onto a width×height grid by strided sampling (truncate/repeat) — the real
    PIL/ffmpeg call swaps in per batch. What's real here and matters at
    scale: output size is BOUNDED regardless of input size (the whole point
    of resizing before shuffling media through a pipeline), and meta travels
    with the payload so downstream operators never re-decode to learn shape.
    """
    import pandas as pd

    n_out = width * height

    def op(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = pdf["payload"].map(
                lambda b: bytes(
                    b[(i * max(len(b), 1)) // n_out % max(len(b), 1)] for i in range(n_out)
                )
                if len(b)
                else bytes(n_out)
            )
            metas = [
                {
                    "mime": "application/octet-stream",
                    "width": width,
                    "height": height,
                    "duration_ms": None,
                    "n_bytes": n_out,
                }
                for _ in range(len(pdf))
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return assets.select("asset_id", "media_type", "payload").mapInPandas(op, RESIZED_SCHEMA)
