"""First-class Spark DataSource for the reference's REST ingestion
(SURVEY §2 S1/S2) via the PySpark 4 Python DataSource API.

The reference calls the YouTube ``videos().list`` endpoint per region
inside its DAG (dags/trending_daily_ingestion.py:76-82) on the single
Airflow worker. Here the same ingestion is a REGISTRABLE SPARK FORMAT:

    spark.dataSource.register(TrendingVideosDataSource)
    df = (spark.read.format("trending_videos")
          .option("regions", "US,GB,DE")
          .option("day_file", "/path/2025-10-06.json")   # replay/backfill
          .load())

Each region is its own ``InputPartition``, so the fetches run ON THE
EXECUTORS in parallel — 50 regions = 50 concurrent fetches with no
driver-side loop, which is the scale story the reference's sequential
worker loop lacks. The returned frame is (region, payload) with payload
the verbatim ``videoListResponse`` JSON; the existing bronze flatten
(sources/bronze.py / operators/flatten.py) consumes it unchanged.

Fetchers resolve from STRING options (the only thing the DataSource
contract ships to executors):

* ``day_file`` — replay a recorded bronze day-file (DayFileFetcher);
  also exactly how an archived-raw backfill runs in production.
* ``fetcher`` — ``"pkg.module:factory"`` dotted path to a zero-arg
  callable returning a ``TrendingFetcher``; a production REST client
  (HTTP + API key + pagination) plugs in here with no engine change.
"""

from __future__ import annotations

import importlib
import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class RegionPartition(InputPartition):
    def __init__(self, region: str):
        self.region = region


def _resolve_fetcher(options: dict):
    day_file = options.get("day_file")
    dotted = options.get("fetcher")
    if day_file:
        from youtube_trending_data_pipeline_spark.sources.fetchers import (
            DayFileFetcher,
        )

        return DayFileFetcher(day_file)
    if dotted:
        mod, _, attr = dotted.partition(":")
        factory = getattr(importlib.import_module(mod), attr)
        return factory()
    raise ValueError(
        "trending_videos needs option 'day_file' (replay) or "
        "'fetcher' (pkg.module:factory)"
    )


class TrendingVideosReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options
        regions = options.get("regions", "")
        self.regions = [r.strip() for r in regions.split(",") if r.strip()]
        if not self.regions:
            raise ValueError("trending_videos needs option 'regions' (csv)")

    def partitions(self):
        # one partition per region: fetches parallelize across executors
        return [RegionPartition(r) for r in self.regions]

    def read(self, partition: RegionPartition):
        fetcher = _resolve_fetcher(self.options)
        payload = fetcher.fetch_trending(partition.region)
        if payload is not None:  # reference's `if region in today_json` guard
            yield (partition.region, json.dumps(payload, sort_keys=True))


class TrendingVideosDataSource(DataSource):
    """``spark.read.format("trending_videos")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "trending_videos"

    def schema(self) -> str:
        return "region string, payload string"

    def reader(self, schema) -> TrendingVideosReader:
        return TrendingVideosReader(self.options)


# ---------------------------------------------------------------------------
# Streaming: incremental day-file backfill as a Spark stream
# ---------------------------------------------------------------------------

import os

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class TrendingDaysStreamReader(SimpleDataSourceStreamReader):
    """Each recorded bronze day-file is one increment: offset = number of
    (lexicographically sorted) files consumed from ``dir``. The daily
    ingestion the reference schedules with Airflow becomes a checkpointed
    Spark stream — replayable via readBetweenOffsets, restartable from
    the checkpoint, drivable with availableNow for batch backfills."""

    def __init__(self, options: dict):
        self.dir = options.get("dir")
        if not self.dir:
            raise ValueError("streaming trending_videos needs option 'dir'")
        regions = options.get("regions", "")
        self.regions = [r.strip() for r in regions.split(",") if r.strip()]
        if not self.regions:
            raise ValueError("streaming trending_videos needs option 'regions'")

    def _files(self) -> list[str]:
        return sorted(
            os.path.join(self.dir, f)
            for f in os.listdir(self.dir)
            if f.endswith(".json")
        )

    def initialOffset(self) -> dict:
        return {"index": 0}

    def _rows_for(self, files: list[str]) -> list[tuple]:
        from youtube_trending_data_pipeline_spark.sources.fetchers import (
            DayFileFetcher,
        )

        # a LIST, not a generator: the simple-reader prefetch cache
        # copy.copy()s the returned iterator for replay, which a
        # generator cannot survive
        rows = []
        for path in files:
            day = os.path.basename(path)[: -len(".json")]
            fetcher = DayFileFetcher(path)
            for region in self.regions:
                payload = fetcher.fetch_trending(region)
                if payload is not None:
                    rows.append((day, region, json.dumps(payload, sort_keys=True)))
        return rows

    def read(self, start: dict):
        files = self._files()
        i = start["index"]
        return self._rows_for(files[i:]), {"index": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = self._files()
        return self._rows_for(files[start["index"]:end["index"]])


class TrendingDaysStreamDataSource(DataSource):
    """``spark.readStream.format("trending_days")`` over a day-file dir."""

    @classmethod
    def name(cls) -> str:
        return "trending_days"

    def schema(self) -> str:
        return "day string, region string, payload string"

    def simpleStreamReader(self, schema) -> TrendingDaysStreamReader:
        return TrendingDaysStreamReader(self.options)
