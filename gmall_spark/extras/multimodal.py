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
