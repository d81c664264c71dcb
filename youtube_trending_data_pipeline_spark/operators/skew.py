"""Skew-resistant aggregation: two-phase salted groupBy.

When a grouping key is pathologically hot (one region/event_type holding
half the data), the single reducer for that key becomes the straggler.
Salting splits each key into ``salt_buckets`` sub-groups aggregated in
parallel, then a second (tiny) aggregation merges the partials — the
manual form of what AQE's skew-join handling does for joins.

The salt is a deterministic hash of a high-cardinality column (never
``rand()`` — results must be reproducible for the driver's value-hash),
so re-runs produce identical partials and the merged result is exactly
the plain groupBy result (asserted by the catalog oracle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str | Column,
    salt_from: str,
    salt_buckets: int = 16,
    out_col: str = "total",
) -> DataFrame:
    """SUM(value) per key, computed skew-safely in two phases."""
    keys = list(keys)
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(salt_buckets))
    )
    return (
        salted.groupBy(*keys, "_salt")
        .agg(F.sum(value).alias("_partial"))
        .groupBy(*keys)
        .agg(F.sum("_partial").alias(out_col))
    )
