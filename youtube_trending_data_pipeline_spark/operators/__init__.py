from youtube_trending_data_pipeline_spark.operators.asof import as_of_join
from youtube_trending_data_pipeline_spark.operators.channels import new_channels
from youtube_trending_data_pipeline_spark.operators.flatten import flatten_videos
from youtube_trending_data_pipeline_spark.operators.insights import daily_insights
from youtube_trending_data_pipeline_spark.operators.mode import mode_per_group
from youtube_trending_data_pipeline_spark.operators.rangejoin import range_join
from youtube_trending_data_pipeline_spark.operators.sessions import (
    session_stats,
    sessionize,
)
from youtube_trending_data_pipeline_spark.operators.skew import salted_sum
from youtube_trending_data_pipeline_spark.operators.topk import top_k_per_group
from youtube_trending_data_pipeline_spark.operators.weekly import weekly_insights

__all__ = [
    "as_of_join",
    "new_channels",
    "flatten_videos",
    "daily_insights",
    "mode_per_group",
    "range_join",
    "sessionize",
    "session_stats",
    "salted_sum",
    "top_k_per_group",
    "weekly_insights",
]
