"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct — the
lakehouse-native layout (one row per asset, bytes inline for small assets
or a URI for large ones). Decode / feature-extraction runs as Arrow-
batched ``mapInPandas`` so each Python worker sees columnar batches, and
partitioning stays by the surrounding Spark job.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are deterministic fakes behind ``_decode_image_impl``
— clearly marked stubs; the Spark-side plumbing (schema, batch iteration,
UDF signatures, partition behavior) is real and tested. Swapping in a
real codec changes one inner function, no plan shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),  # inline bytes (or empty if uri set)
        StructField("uri", StringType()),  # external object-store path
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("codec", StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _decode_image_impl(content: bytes) -> list[float]:
    """STUB: deterministic fake 8-dim feature from the raw bytes.

    Real implementation would be e.g. PIL decode + resize + CNN features;
    those libraries are not available in this container. The fake keeps
    the full pipeline runnable and the output deterministic.
    """
    if content is None:
        raise NotImplementedError("URI-only assets need an object-store fetch step")
    h = 1469598103934665603  # FNV-1a over bytes -> 8 pseudo-features
    feats = []
    for i in range(8):
        acc = h ^ i
        for byte in content[:64]:
            acc = ((acc ^ byte) * 1099511628211) & ((1 << 64) - 1)
        feats.append((acc % 10_000) / 10_000.0)
    return feats


def extract_image_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas image featurization: Arrow batches in, feature rows out.

    The iterator-of-batches shape means constant memory per worker
    regardless of partition size — the 100 TB-safe way to run Python
    kernels. Filter pushdown on media_type happens before the Python
    boundary (JVM-side where())."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": pdf["content"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "feature": pdf["content"].map(_decode_image_impl),
                }
            )

    images = media.where(F.col("media_type") == "image").select("asset_id", "content")
    return images.mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video assets: one output row per sampled
    timestamp. The timestamp grid is computed JVM-side from duration_ms
    (sequence + explode); only the (stubbed) frame decode would touch the
    bytes. Returns (asset_id, frame_ts_ms, frame: binary-null-stub)."""
    videos = media.where(
        (F.col("media_type") == "video") & F.col("duration_ms").isNotNull()
    )
    return videos.select(
        "asset_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.col("duration_ms"),
                F.lit(every_ms).cast("long"),
            )
        ).alias("frame_ts_ms"),
        F.lit(None).cast("binary").alias("frame"),  # STUB: ffmpeg not available
    )
