"""Gold aggregation: per-(region, date) daily insights (SURVEY §2 A1-A6, W1).

Reference: dags/trending_daily_aggregates.py:52-111 implements group-by as
a Python loop over ``set(df["region"])`` with boolean-mask partitions and
per-group pandas reductions. The Spark formulation is one
``groupBy("region","date")`` — partial (map-side) aggregation then a
single hash exchange on the group key; the mode sub-aggregate reuses the
same shuffle key so AQE can pipeline the two.

Semantics faithfully reproduced:
* averages rounded to 2 dp (agg:69,72,75)
* engagement_ratio = (likes + 2*comments)/views * 1000, 0 when views==0,
  UNROUNDED (agg:79-84)
* top_category_id = per-group modal category_id cast to int (agg:87-88);
  tie-break documented in operators/mode.py
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from youtube_trending_data_pipeline_spark.operators.mode import mode_per_group


def daily_insights(videos: DataFrame, order_col: str | None = None) -> DataFrame:
    """silver ``daily_trending_videos`` -> gold ``daily_insights``."""
    base = videos.groupBy("region", "date").agg(
        F.sum("views_count").alias("total_views"),
        F.round(F.avg("views_count"), 2).alias("average_views"),
        F.max("views_count").alias("highest_views"),
        F.sum("likes_count").alias("total_likes"),
        F.round(F.avg("likes_count"), 2).alias("average_likes"),
        F.max("likes_count").alias("highest_likes"),
        F.sum("comments_count").alias("total_comments"),
        F.round(F.avg("comments_count"), 2).alias("average_comments"),
        F.max("comments_count").alias("highest_comments"),
    )
    base = base.withColumn(
        "engagement_ratio",
        F.when(
            F.col("total_views") > 0,
            (F.col("total_likes") + 2 * F.col("total_comments"))
            / F.col("total_views")
            * 1000.0,
        ).otherwise(F.lit(0.0)),
    )
    top_cat = mode_per_group(
        videos,
        ["region", "date"],
        "category_id",
        order_col=order_col,
        out_col="top_category_id_str",
    ).select(
        "region",
        "date",
        F.col("top_category_id_str").cast("long").alias("top_category_id"),
    )
    return base.join(top_cat, ["region", "date"], "left")
