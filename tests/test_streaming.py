"""Structured Streaming: availableNow bronze->silver must equal the batch
path, re-runs must be exactly-once (checkpoint), and the watermarked
window aggregate must produce the batch-equivalent result."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from youtube_trending_data_pipeline_spark.operators.flatten import flatten_videos
from youtube_trending_data_pipeline_spark.sources.bronze import (
    read_bronze_day,
    region_items,
)
from youtube_trending_data_pipeline_spark.streaming.jobs import (
    stream_bronze_to_silver,
    windowed_event_counts,
)

RUN_DATE = dt.date(2025, 10, 6)


def test_stream_matches_batch_and_is_idempotent(spark, bronze_day_path, tmp_path):
    import shutil

    bronze_dir = str(tmp_path / "bronze")
    silver_dir = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")
    (tmp_path / "bronze").mkdir()
    shutil.copy(bronze_day_path, bronze_dir)

    q = stream_bronze_to_silver(spark, bronze_dir, silver_dir, ckpt, RUN_DATE)
    q.awaitTermination(120)

    streamed = spark.read.parquet(silver_dir)
    batch = flatten_videos(
        region_items(read_bronze_day(spark, bronze_dir)), RUN_DATE
    )
    assert streamed.count() == batch.count() == 60
    s = {tuple(r) for r in streamed.select(sorted(streamed.columns)).collect()}
    b = {tuple(r) for r in batch.select(sorted(batch.columns)).collect()}
    assert s == b

    # second run with same checkpoint: no new files -> no duplicate rows
    q2 = stream_bronze_to_silver(spark, bronze_dir, silver_dir, ckpt, RUN_DATE)
    q2.awaitTermination(120)
    assert spark.read.parquet(silver_dir).count() == 60


def test_windowed_counts_match_batch_groupby(spark, tmp_path):
    rows = [
        (i, dt.datetime(2024, 1, 1, hour, minute, 0), "click" if i % 2 else "view", 1.5)
        for i, (hour, minute) in enumerate(
            [(0, 5), (0, 55), (1, 10), (1, 40), (2, 0), (2, 59)]
        )
    ]
    src = str(tmp_path / "ev")
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out_rows = []
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("select * from win_counts").collect()
    }
    batch = (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("ws"), "event_type", "n_events")
    )
    expected = {(r["ws"], r["event_type"]): r["n_events"] for r in batch.collect()}
    assert got == expected
