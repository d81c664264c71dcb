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


def channels_from_fetcher(
    ids_df: DataFrame, fetcher: TrendingFetcher, batch_size: int = 50
) -> DataFrame:
    """Distributed channel-metadata fetch over the new-id frame (S2).

    The anti-joined id set streams through ``mapInPandas``: each executor
    task slices its Arrow batch into chunks of at most ``batch_size`` ids
    and calls ``fetcher.fetch_channels`` per chunk — so NO driver-side
    collect of the id list exists anywhere (VERDICT r4: an unbounded
    first-run backfill would otherwise land the whole channel id universe
    on the driver; reference loops one-by-one driver-side, ing:135-138).
    Ids are sorted within a chunk for deterministic request shapes. The
    fetcher is shipped to executors by pickle; a production REST fetcher
    should open its HTTP client lazily on first call so the connection
    is created per worker, not serialized."""
    from youtube_trending_data_pipeline_spark.schemas import CHANNELS

    cols = [f.name for f in CHANNELS.fields]

    def fetch_batches(batches):
        import pandas as pd

        for pdf in batches:
            ids = sorted(pdf["channel_id"].dropna().tolist())
            for i in range(0, len(ids), batch_size):
                rows = fetcher.fetch_channels(ids[i : i + batch_size])
                if rows:
                    yield pd.DataFrame(
                        [{c: r.get(c) for c in cols} for r in rows],
                        columns=cols,
                    )

    return ids_df.mapInPandas(fetch_batches, CHANNELS)


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
