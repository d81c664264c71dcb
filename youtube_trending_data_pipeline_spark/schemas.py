"""Explicit StructType schemas for bronze / silver / gold tables.

The reference infers every schema (BigQuery ``load_table_from_dataframe``
with CREATE_IF_NEEDED, dags/trending_daily_ingestion.py:194-200); we make
them explicit so scans never pay inference and Parquet pruning is exact.

Shapes are documented in SURVEY.md §1 and FIXTURES.md; cited reference
lines identify where each column's semantics come from.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# ---------------------------------------------------------------------------
# Bronze: one JSON object per day, region code -> YouTube videoListResponse
# (reference builds it at dags/trending_daily_ingestion.py:76-91; the shape
# is evidenced by assets/2025-10-06.json).
# ---------------------------------------------------------------------------

THUMBNAIL = StructType(
    [
        StructField("url", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

SNIPPET = StructType(
    [
        StructField("publishedAt", StringType()),  # ISO-8601 with trailing Z
        StructField("channelId", StringType()),
        StructField("title", StringType()),
        StructField("description", StringType()),
        StructField("channelTitle", StringType()),
        StructField("categoryId", StringType()),  # numeric STRING (ing:168)
        StructField("liveBroadcastContent", StringType()),
        StructField("defaultLanguage", StringType()),  # optional
        StructField("defaultAudioLanguage", StringType()),  # optional
        StructField("tags", ArrayType(StringType())),  # optional
        StructField(
            "localized",
            StructType(
                [
                    StructField("title", StringType()),
                    StructField("description", StringType()),
                ]
            ),
        ),
        StructField("thumbnails", MapType(StringType(), THUMBNAIL)),
    ]
)

CONTENT_DETAILS = StructType(
    [
        StructField("duration", StringType()),  # ISO-8601 duration "PT3M59S"
        StructField("dimension", StringType()),
        StructField("definition", StringType()),
        StructField("caption", StringType()),
        StructField("licensedContent", BooleanType()),
        StructField("projection", StringType()),
        StructField(
            "regionRestriction",
            StructType([StructField("blocked", ArrayType(StringType()))]),
        ),
        StructField("contentRating", MapType(StringType(), StringType())),
    ]
)

STATISTICS = StructType(
    [
        # ALL stringified ints in the source; like/comment optional
        # (ing:170-172 uses .get(k, 0) defaults).
        StructField("viewCount", StringType()),
        StructField("likeCount", StringType()),
        StructField("favoriteCount", StringType()),
        StructField("commentCount", StringType()),
    ]
)

VIDEO_ITEM = StructType(
    [
        StructField("kind", StringType()),
        StructField("etag", StringType()),
        StructField("id", StringType()),
        StructField("snippet", SNIPPET),
        StructField("contentDetails", CONTENT_DETAILS),
        StructField("statistics", STATISTICS),
    ]
)

VIDEO_LIST_RESPONSE = StructType(
    [
        StructField("kind", StringType()),
        StructField("etag", StringType()),
        StructField("nextPageToken", StringType()),
        StructField(
            "pageInfo",
            StructType(
                [
                    StructField("totalResults", IntegerType()),
                    StructField("resultsPerPage", IntegerType()),
                ]
            ),
        ),
        StructField("items", ArrayType(VIDEO_ITEM)),
    ]
)

# The whole day-file: region code -> response. Read as a map so unknown
# region keys need no schema change (SURVEY §1.4).
RAW_DAY = MapType(StringType(), VIDEO_LIST_RESPONSE)

# ---------------------------------------------------------------------------
# Silver
# ---------------------------------------------------------------------------

# daily_trending_videos (ing:166-176)
DAILY_TRENDING_VIDEOS = StructType(
    [
        StructField("id", StringType()),
        StructField("date", DateType()),
        StructField("category_id", StringType()),  # string, NOT int (ing:168)
        StructField("channel_id", StringType()),
        StructField("comments_count", LongType()),
        StructField("likes_count", LongType()),
        StructField("views_count", LongType()),
        StructField("duration", LongType()),  # seconds (ing:173,40-42)
        StructField("title", StringType()),
        StructField("publish_date", TimestampNTZType()),  # naive UTC (ing:44-45)
        StructField("region", StringType()),
    ]
)

# channels (ing:99-107)
CHANNELS = StructType(
    [
        StructField("id", StringType()),
        StructField("channel_name", StringType()),
        StructField("country", StringType()),  # default "Unkown" sic (ing:101)
        StructField("creation_date", TimestampNTZType()),
        StructField("made_for_kids", BooleanType()),  # default false (ing:103)
        StructField("subscribers_count", LongType()),
        StructField("views_count", LongType()),
        StructField("videos_count", LongType()),
        StructField("keywords", StringType()),  # default "" (ing:107)
    ]
)

# ---------------------------------------------------------------------------
# Gold: daily_insights (dags/trending_daily_aggregates.py:65-88)
# ---------------------------------------------------------------------------

DAILY_INSIGHTS = StructType(
    [
        StructField("region", StringType()),
        StructField("date", DateType()),
        StructField("total_views", LongType()),
        StructField("average_views", DoubleType()),
        StructField("highest_views", LongType()),
        StructField("total_likes", LongType()),
        StructField("average_likes", DoubleType()),
        StructField("highest_likes", LongType()),
        StructField("total_comments", LongType()),
        StructField("average_comments", DoubleType()),
        StructField("highest_comments", LongType()),
        StructField("engagement_ratio", DoubleType()),  # UNROUNDED (agg:82-84)
        StructField("top_category_id", LongType()),  # string->int here (agg:87-88)
    ]
)
