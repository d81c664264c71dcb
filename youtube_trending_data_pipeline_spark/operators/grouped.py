"""Grouped-map (applyInPandas) extension point.

The engine's rule is JVM-first: anything expressible with windows/aggs
stays out of Python. This module demonstrates the escape hatch for when
it genuinely isn't — per-group Python kernels over Arrow batches — using
per-group z-score normalization implemented BOTH ways. The test suite
asserts they agree; the JVM version is the one the catalog uses.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType


def zscore_jvm(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group z-score via window aggregates — no Python, no extra
    shuffle beyond the group key."""
    w = Window.partitionBy(group_col)
    mean = F.avg(value_col).over(w)
    std = F.stddev_pop(value_col).over(w)
    return df.withColumn(
        "zscore",
        F.when(std > 0, (F.col(value_col) - mean) / std).otherwise(F.lit(0.0)),
    )


def zscore_pandas(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Same semantics through applyInPandas: one Arrow batch per group in
    a Python worker. The slow path — kept as the template for kernels
    that NEED imperative per-group logic (model fits, scipy, ...)."""
    fields = [
        StructField(group_col, df.schema[group_col].dataType),
        StructField(value_col, df.schema[value_col].dataType),
        StructField("zscore", DoubleType()),
    ]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=0)
        mean = pdf[value_col].mean()
        out = pdf[[group_col, value_col]].copy()
        out["zscore"] = (
            (pdf[value_col] - mean) / std if std > 0 else 0.0
        )
        return out

    return (
        df.select(group_col, value_col)
        .groupBy(group_col)
        .applyInPandas(kernel, schema=StructType(fields))
    )
