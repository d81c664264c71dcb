"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference YouTube-Trending-Data-Pipeline
(Khalil-Zakout/YouTube-Trending-Data-Pipeline), rebuilt Spark-first.

Layers (mirroring SURVEY.md §1):
  bronze  — raw per-day JSON documents (region -> videoListResponse)
  silver  — relational tables ``daily_trending_videos``, ``channels``
  gold    — aggregate table ``daily_insights`` + weekly report

All transforms are pure functions DataFrame -> DataFrame, declared via the
DataFrame API so Catalyst plans them (predicate pushdown, column pruning,
broadcast joins, whole-stage codegen come free). No RDDs, no driver-side
loops over collected rows.
"""

from youtube_trending_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
