"""Scalar / vector / text column functions.

Everything here is a pure Column expression (JVM-side, codegen-friendly)
unless the docstring says otherwise; Python ever touches rows only inside
Arrow-batched pandas UDFs.
"""

from youtube_trending_data_pipeline_spark.functions.durations import iso8601_duration_seconds
from youtube_trending_data_pipeline_spark.functions.timestamps import parse_naive_utc
from youtube_trending_data_pipeline_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "iso8601_duration_seconds",
    "parse_naive_utc",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
