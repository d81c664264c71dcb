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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_from: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: fact rows carry a deterministic salt derived
    from a high-cardinality column; the (small) dimension is exploded
    ``salt_buckets``-fold so every (key, salt) combination exists, and
    the join key becomes (key, salt) — a hot fact key's rows spread
    over ``salt_buckets`` shuffle partitions instead of one reducer.

    Salting is result-invariant (each fact row still matches exactly
    its dimension row), so an oracle can verify with the plain join.
    The manual form of AQE's skew-join split, for the paths AQE cannot
    touch: stream-static joins, bucketed SMJs, AQE-off engines. Returns
    the joined frame with the dimension columns attached; the salt and
    duplicate key columns are dropped.
    """
    salted_fact = fact.withColumn(
        "_salt", F.col(salt_from) % F.lit(salt_buckets)
    )
    salted_dim = (
        dim.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
        )
        .withColumn("_salt", F.col("_salt").cast("long"))
    )
    joined = salted_fact.join(
        salted_dim,
        (salted_fact[fact_key] == salted_dim[dim_key])
        & (salted_fact["_salt"] == salted_dim["_salt"]),
    )
    return joined.drop(salted_dim[dim_key]).drop(
        salted_fact["_salt"]
    ).drop(salted_dim["_salt"])
