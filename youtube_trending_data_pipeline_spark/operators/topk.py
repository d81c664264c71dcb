"""Top-k per group (SURVEY §2 L2/L3 generalized).

The reference never computes top-k itself (YouTube's API returns the
top-20, ing:78), but the engine exposes it as a first-class operator.

Implementation: ``row_number`` over a per-group window. Spark's physical
plan for this is a (partial) sort within shuffle partitions of the group
key — no global sort, no driver collection. For k=1 prefer
``max_by``-style aggregation (no window state) via ``mode_per_group`` /
plain ``groupBy().agg(F.max_by(...))``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top ``k`` rows per group ordered by ``order_by`` columns."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )
