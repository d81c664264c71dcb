from youtube_trending_data_pipeline_spark.operators.flatten import flatten_videos
from youtube_trending_data_pipeline_spark.operators.channels import new_channels
from youtube_trending_data_pipeline_spark.operators.insights import daily_insights
from youtube_trending_data_pipeline_spark.operators.weekly import weekly_insights
from youtube_trending_data_pipeline_spark.operators.mode import mode_per_group
from youtube_trending_data_pipeline_spark.operators.topk import top_k_per_group

__all__ = [
    "flatten_videos",
    "new_channels",
    "daily_insights",
    "weekly_insights",
    "mode_per_group",
    "top_k_per_group",
]
