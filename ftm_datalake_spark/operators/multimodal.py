"""Multimodal column handling: images/audio/video as opaque binary columns
with typed metadata, processed in Arrow batches via mapInPandas.

The Spark-side plumbing (schemas, batch iteration, partition-size control)
is real and tested; the actual media decode is STUBBED behind
`NotImplementedError` / a deterministic fake, because media libraries are
not available in this container. Swapping `_decode_image_stub` for a real
PIL/ffmpeg call changes nothing structurally: same UDF signature, same
batch shape, same output schema.

Scale notes:
- mapInPandas streams Arrow record batches; `spark.sql.execution.arrow.
  maxRecordsPerBatch` bounds peak memory per batch when payloads are MBs.
- Binary payloads should arrive via `binaryFile` scans or pointer columns
  (path + range) — never collect; features travel, blobs stay put.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def _decode_image_stub(content: bytes) -> tuple[int, int, float]:
    """STUB decode: deterministic fake dims/luma from the byte content.

    Real implementation: PIL.Image.open(io.BytesIO(content)) — not
    available in this container."""
    if content is None:
        return (0, 0, 0.0)
    n = len(content)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    luma = (sum(content[:256]) % 2551) / 10.0 if n else 0.0
    return (width, height, luma)


def image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract images in Arrow batches (mapInPandas)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                width, height, luma = _decode_image_stub(content)
                rows.append(
                    {
                        "media_id": media_id,
                        "n_bytes": len(content) if content is not None else 0,
                        "width": width,
                        "height": height,
                        "mean_luma": luma,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return (
        media.where(F.col("modality") == "image")
        .select("media_id", "content")
        .mapInPandas(extract, IMAGE_FEATURES_SCHEMA)
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: real implementation needs an image library."""
    raise NotImplementedError(
        "image resize requires PIL/opencv; not available in this container. "
        "Plumbing: mapInPandas over (media_id, content) -> (media_id, content) "
        "with MEDIA_SCHEMA output, identical to image_features."
    )


def sample_frames(media: DataFrame, every_n: int = 10, max_frames: int = 8) -> DataFrame:
    """Frame-sample videos: deterministic fake frames (byte slices) with
    real batch plumbing. Real implementation: ffmpeg/pyav per batch."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                # fake "frames": fixed-size slices at every_n strides
                stride = max(1, every_n)
                for idx in range(min(max_frames, max(1, len(content) // (stride * 16)))):
                    start = idx * stride * 16
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": idx,
                            "frame": bytes(content[start : start + 16]),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return (
        media.where(F.col("modality") == "video")
        .select("media_id", "content")
        .mapInPandas(sample, FRAME_SCHEMA)
    )


def pseudo_embed(media: DataFrame, dims: int = 8) -> DataFrame:
    """Deterministic pseudo-embedding from content bytes — stands in for a
    model-forward pass; same shape as a real encoder output."""
    import hashlib

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        ]
    )

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                digest = hashlib.sha256(content or b"").digest()
                vec = [
                    (digest[i % 32] - 128) / 128.0 for i in range(dims)
                ]
                rows.append({"media_id": media_id, "embedding": vec})
            yield pd.DataFrame(rows, columns=["media_id", "embedding"])

    return media.select("media_id", "content").mapInPandas(embed, out_schema)
