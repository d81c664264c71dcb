"""Ingestion fetcher seam (SURVEY §2 S1/S2).

The reference pulls trending pages and channel metadata straight from the
YouTube REST API inside its ingestion DAG
(dags/trending_daily_ingestion.py:76-82 trending, 94-97 channels). Network
ingestion is out of engine scope (SURVEY §2.1), but the *seam* is not:
``run_daily_ingestion`` accepts any ``TrendingFetcher``, so the reference's
REST calls map onto an injection point instead of being bypassed by test
fixtures. The default implementation replays a recorded day-file — the
same JSON shape the reference persists to S3 (ing:83-91) — which is also
exactly how a backfill over archived raw days runs at scale.

A production REST implementation (HTTP client + API key + pagination)
implements the same two methods; nothing else in the pipeline changes.
"""

from __future__ import annotations

import datetime
import json
from collections.abc import Sequence
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from youtube_trending_data_pipeline_spark.schemas import VIDEO_LIST_RESPONSE


class TrendingFetcher(Protocol):
    """What the ingestion job needs from the outside world.

    ``fetch_trending`` returns one region's verbatim ``videoListResponse``
    payload (or None when the region has no data today — the reference's
    ``if region in today_json`` guard, ing:155). ``fetch_channels``
    returns one metadata dict per requested channel id (reference fetches
    these one-by-one for new channels, ing:94-97, 135-138)."""

    def fetch_trending(self, region: str) -> dict | None:
        ...

    def fetch_channels(self, channel_ids: Sequence[str]) -> list[dict]:
        ...


class DayFileFetcher:
    """Replay fetcher: serves regions from a recorded bronze day-file and
    synthesizes deterministic channel metadata (tests override via their
    own fetcher when they need specific channel rows)."""

    def __init__(self, day_file: str, channels: Sequence[dict] | None = None):
        with open(day_file) as fh:
            self._day = json.load(fh)
        self._channels = {c["id"]: c for c in (channels or [])}

    def fetch_trending(self, region: str) -> dict | None:
        return self._day.get(region)

    def fetch_channels(self, channel_ids: Sequence[str]) -> list[dict]:
        out = []
        for cid in channel_ids:
            out.append(
                self._channels.get(cid)
                or {
                    "id": cid,
                    "channel_name": f"channel {cid}",
                    "country": None,
                    "creation_date": datetime.datetime(2020, 1, 1),
                    "made_for_kids": None,
                    "subscribers_count": None,
                    "views_count": None,
                    "videos_count": None,
                    "keywords": None,
                }
            )
        return out


def bronze_from_fetcher(
    spark: SparkSession, fetcher: TrendingFetcher, regions: Sequence[str]
) -> DataFrame:
    """(region, response) bronze frame via the fetcher seam — the exact
    output shape of sources.bronze.read_bronze_day, so everything
    downstream (region_items -> flatten_videos -> sinks) is identical.

    The fetch itself is a driver-side loop over ~hundreds of regions max
    (the reference serves 3) — the heavy lifting starts after the payloads
    enter Spark as rows."""
    schema = StructType(
        [
            StructField("region", StringType()),
            StructField("response", VIDEO_LIST_RESPONSE),
        ]
    )
    rows = []
    for region in regions:
        payload = fetcher.fetch_trending(region)
        if payload is not None:  # P7 key-presence guard
            rows.append((region, payload))
    return spark.createDataFrame(rows, schema)
