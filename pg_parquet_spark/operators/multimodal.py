"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata (beyond-reference surface).

Design (the part that matters at 100 TB):

- media travels as a ``binary`` column next to a ``STRUCT`` of typed
  metadata (modality, mime, width/height/duration, sha256) — the struct
  prunes independently of the blob, so metadata-only queries never read
  media bytes (Parquet column pruning);
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages — one Python worker per partition, batch-sized
  by ``spark.sql.execution.arrow.maxRecordsPerBatch``, no driver
  involvement;
- the actual codec calls are STUBBED (the image/audio libraries are not
  in this container): ``decode_image`` raises ``NotImplementedError``
  unless ``fake=True``, in which case a deterministic fake decoder
  (seeded by the blob's sha256) produces stable "pixels" so the
  Spark-side plumbing — schema, partitioning, UDF signature, batch
  shape — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("blob", BinaryType()),
        StructField("modality", StringType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
    ]
)


def attach_media_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Compute the typed metadata struct JVM-side (no Python): byte
    length + sha256 — the dedup/id key for blobs."""
    b = F.col(blob_col)
    return df.select(
        "*",
        F.length(b).cast("bigint").alias("n_bytes"),
        F.sha2(b, 256).alias("sha256"),
    )


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text payload as a binary blob
    (the container has no real media files; byte semantics are identical)."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("blob"),
        F.lit("image").alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
    )


FEATURES_SCHEMA = (
    "media_id BIGINT, width INT, height INT, n_channels INT, "
    "mean_intensity DOUBLE, feature STRING"
)


def decode_image(blob: bytes, fake: bool = False) -> dict:
    """STUB: real decode needs PIL/opencv (not in this container).

    fake=True → deterministic pseudo-decode seeded by content hash:
    stable width/height/intensity so tests and benchmarks exercise the
    full distributed path with reproducible outputs.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv which are not available; "
            "pass fake=True for the deterministic test decoder"
        )
    digest = hashlib.sha256(blob).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    channels = 1 + digest[2] % 3
    mean_intensity = digest[3] / 255.0
    return {
        "width": width,
        "height": height,
        "n_channels": channels,
        "mean_intensity": mean_intensity,
        "feature": digest[:8].hex(),
    }


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """Distributed decode via mapInPandas (Arrow batches; executor-side).

    Each batch arrives as a pandas DataFrame of (media_id, blob); the
    stub decoder emits fixed-schema feature rows. Swapping in a real
    decoder changes only the inner function.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, blob in zip(pdf["media_id"], pdf["blob"]):
                feats = decode_image(bytes(blob), fake=fake)
                out.append({"media_id": media_id, **feats})
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "n_channels",
                    "mean_intensity",
                    "feature",
                ],
            )

    return df.select("media_id", "blob").mapInPandas(decode_batches, FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling stub: deterministic 1-in-N selection by
    content-hash bucket (JVM-side modulo on sha256 — no Python)."""
    return df.filter(
        F.conv(F.substring(F.sha2(F.col("blob"), 256), 1, 8), 16, 10).cast("long")
        % every_n
        == 0
    )
