"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct — the
lakehouse-native layout (one row per asset, bytes inline for small assets
or a URI for large ones). Decode / feature-extraction runs as Arrow-
batched ``mapInPandas`` so each Python worker sees columnar batches, and
partitioning stays by the surrounding Spark job.

Image decode is REAL for two uncompressed formats, implemented in pure
Python (no external codecs needed): binary PPM (P6, maxval <= 255) and
24-bit uncompressed BMP (BI_RGB). Features are computed from the actual
decoded pixels and verified against hand-computed fixtures in
tests/test_extensions.py and an exact DuckDB oracle
(catalog_ext.multimodal_image_features). Compressed formats (JPEG/PNG)
would slot into the same ``_decode_image_impl`` dispatch via PIL when
available; unrecognized bytes fall back to a deterministic byte-hash
feature so a mixed-media corpus never crashes the job.

Video frame sampling remains a declared stub (ffmpeg not in container);
the timestamp grid and plan shape are real.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
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
        # double, not float: features are exact integer ratios (see
        # pixel_features) and the correctness oracle replays them
        # bit-identically — float32 would truncate differently per engine
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def decode_ppm(content: bytes) -> tuple[int, int, bytes]:
    """Decode a binary PPM (P6, maxval <= 255) to (width, height, RGB bytes).

    Full header grammar: ASCII tokens separated by whitespace, ``#``
    comments allowed anywhere in the header, exactly one whitespace byte
    between maxval and the raster.
    """
    if content[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) image")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        # skip whitespace and comments
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if pos < len(content) and content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(content) and content[pos : pos + 1].isdigit():
            pos += 1
        if start == pos:
            raise ValueError("malformed PPM header")
        vals.append(int(content[start:pos]))
    width, height, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pos += 1  # single whitespace byte after maxval
    raster = content[pos : pos + width * height * 3]
    if len(raster) != width * height * 3:
        raise ValueError("PPM raster truncated")
    return width, height, raster


def decode_bmp(content: bytes) -> tuple[int, int, bytes]:
    """Decode an uncompressed 24-bit BMP (BI_RGB) to (width, height, RGB
    bytes, top-down row order, BGR swapped to RGB)."""
    import struct

    if content[:2] != b"BM":
        raise ValueError("not a BMP image")
    (data_offset,) = struct.unpack_from("<I", content, 10)
    width, height = struct.unpack_from("<ii", content, 18)
    (bpp,) = struct.unpack_from("<H", content, 28)
    (compression,) = struct.unpack_from("<I", content, 30)
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    top_down = height < 0
    height = abs(height)
    row_stride = (width * 3 + 3) & ~3  # rows padded to 4 bytes
    out = bytearray(width * height * 3)
    for row in range(height):
        src_row = row if top_down else height - 1 - row
        base = data_offset + src_row * row_stride
        for x in range(width):
            b, g, r = content[base + 3 * x : base + 3 * x + 3]
            o = (row * width + x) * 3
            out[o], out[o + 1], out[o + 2] = r, g, b
    return width, height, bytes(out)


def pixel_features(width: int, height: int, rgb: bytes) -> list[float]:
    """8-dim feature vector from decoded pixels, exact integer-ratio math
    so any engine replays it bit-identically: [width, height, mean_r,
    mean_g, mean_b, mean_all, min/255, max/255]."""
    n = width * height
    sum_r = sum(rgb[0::3])
    sum_g = sum(rgb[1::3])
    sum_b = sum(rgb[2::3])
    return [
        float(width),
        float(height),
        sum_r / (255.0 * n),
        sum_g / (255.0 * n),
        sum_b / (255.0 * n),
        (sum_r + sum_g + sum_b) / (255.0 * 3 * n),
        min(rgb) / 255.0,
        max(rgb) / 255.0,
    ]


def _fallback_features(content: bytes) -> list[float]:
    """Deterministic byte-hash feature for formats with no codec available
    (FNV-1a over the first 64 bytes) — keeps mixed-media corpora flowing;
    clearly NOT pixel-derived."""
    h = 1469598103934665603
    feats = []
    for i in range(8):
        acc = h ^ i
        for byte in content[:64]:
            acc = ((acc ^ byte) * 1099511628211) & ((1 << 64) - 1)
        feats.append((acc % 10_000) / 10_000.0)
    return feats


def _decode_image_impl(content: bytes) -> list[float]:
    """Real image decode -> pixel features. Dispatches on magic bytes:
    P6 PPM and 24-bit BMP decode for real (pure Python); anything else
    takes the labeled byte-hash fallback."""
    if content is None:
        raise NotImplementedError("URI-only assets need an object-store fetch step")
    import struct

    try:
        if content[:2] == b"P6":
            return pixel_features(*decode_ppm(content))
        if content[:2] == b"BM":
            return pixel_features(*decode_bmp(content))
    except (ValueError, IndexError, struct.error):  # malformed media -> fallback
        pass
    return _fallback_features(content)


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
