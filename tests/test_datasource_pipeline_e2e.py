"""The reference's full day as ONE Spark-native path: REST-shaped
ingestion through the registered `trending_videos` format, bronze
payload parse, silver flatten, gold daily insights, HTML render, and
delivery through the `report_sender` writer — no seam left outside
Spark. The reference runs this same day across three Airflow DAGs
(ingestion -> aggregates -> report); here it is one lineage."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from youtube_trending_data_pipeline_spark.operators.flatten import flatten_videos
from youtube_trending_data_pipeline_spark.operators.insights import daily_insights
from youtube_trending_data_pipeline_spark.report.html import render_weekly_html
from youtube_trending_data_pipeline_spark.schemas import VIDEO_LIST_RESPONSE
from youtube_trending_data_pipeline_spark.sources.datasource import (
    ReportSenderDataSource,
    TrendingVideosDataSource,
)


def test_full_day_through_spark_native_path(spark, bronze_day_path, tmp_path):
    spark.dataSource.register(TrendingVideosDataSource)
    spark.dataSource.register(ReportSenderDataSource)
    run_date = dt.date(2025, 10, 6)

    # S1: REST-shaped read (partition per region, executor-side fetch)
    bronze = (
        spark.read.format("trending_videos")
        .option("regions", "QA,US,DE")
        .option("day_file", bronze_day_path)
        .load()
    )
    # P1/J4: payload parse + item demultiplex
    items = bronze.select(
        "region",
        F.from_json("payload", VIDEO_LIST_RESPONSE).alias("response"),
    ).select("region", F.explode("response.items").alias("item"))
    # silver flatten + gold insights
    silver = flatten_videos(items, run_date)
    assert silver.count() == 60
    gold = daily_insights(silver)
    rows = {r.region: r for r in gold.collect()}
    assert set(rows) == {"QA", "US", "DE"}
    assert all(r.total_views > 0 for r in rows.values())

    # F12 + S11: render and deliver through the Spark writer
    html = render_weekly_html(gold.orderBy("region"), title="Daily Insights")
    reports = spark.createDataFrame(
        [(f"daily insights {run_date}", html, "team@example.com")],
        "subject string, html string, recipients string",
    )
    out = tmp_path / "sent"
    reports.write.format("report_sender").option("out_dir", str(out)).mode(
        "append"
    ).save()
    sent = list(out.iterdir())
    assert len(sent) == 1
    body = sent[0].read_text()
    for region in ("QA", "US", "DE"):
        assert region in body
