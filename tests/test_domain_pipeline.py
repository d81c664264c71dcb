"""End-to-end bronze -> silver -> gold -> weekly report on a synthetic
day-file (FIXTURES.md §§1-6), asserting the reference's documented
semantics (SURVEY.md §2)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from youtube_trending_data_pipeline_spark.operators.flatten import flatten_videos
from youtube_trending_data_pipeline_spark.operators.insights import daily_insights
from youtube_trending_data_pipeline_spark.operators.weekly import weekly_insights
from youtube_trending_data_pipeline_spark.sources.bronze import (
    read_bronze_day,
    region_items,
)

RUN_DATE = dt.date(2025, 10, 6)


def _silver(spark, bronze_day_path):
    bronze = read_bronze_day(spark, bronze_day_path)
    return flatten_videos(region_items(bronze), RUN_DATE)


def test_bronze_read_demultiplex(spark, bronze_day_path):
    bronze = read_bronze_day(spark, bronze_day_path)
    assert bronze.count() == 3
    assert set(r["region"] for r in bronze.select("region").collect()) == {"QA", "US", "DE"}
    # requesting an absent region yields no row for it (P7, ing:155)
    bronze2 = read_bronze_day(spark, bronze_day_path, regions=["QA", "FR"])
    assert [r["region"] for r in bronze2.select("region").collect()] == ["QA"]


def test_corrupt_day_file_handling(spark, tmp_path):
    import pytest

    bad = tmp_path / "bad.json"
    bad.write_text('{"QA": {"items": [')  # truncated JSON
    # permissive: corrupt file -> zero rows, job survives (ingest at scale)
    out = read_bronze_day(spark, str(bad))
    assert out.count() == 0
    # strict: backfills fail loudly instead of silently dropping data
    with pytest.raises(Exception):
        read_bronze_day(spark, str(bad), strict=True).collect()


def test_flatten_schema_and_defaults(spark, bronze_day_path):
    silver = _silver(spark, bronze_day_path)
    rows = silver.collect()
    assert len(rows) == 60
    by_id = {r["id"]: r for r in rows}
    # missing likeCount/commentCount default to 0 (ing:170-171)
    r3 = by_id["vid-QA-3"]
    assert r3["likes_count"] == 0 and r3["comments_count"] == 0
    assert r3["views_count"] == 4000
    # category stays a string (ing:168)
    assert isinstance(r3["category_id"], str)
    # durations: i=0 -> PT45S, i=2 -> PT1H2M3S, i=3 -> P1DT2H
    assert by_id["vid-QA-0"]["duration"] == 45
    assert by_id["vid-QA-2"]["duration"] == 3723
    assert by_id["vid-QA-3"]["duration"] == 93600
    # naive UTC timestamp (ing:44-45)
    assert by_id["vid-QA-0"]["publish_date"] == dt.datetime(2025, 10, 1, 12, 30)


def test_daily_insights_semantics(spark, bronze_day_path):
    silver = _silver(spark, bronze_day_path)
    gold = daily_insights(silver)
    rows = {r["region"]: r for r in gold.collect()}
    assert set(rows) == {"QA", "US", "DE"}
    qa = rows["QA"]
    # recompute expected with plain python
    data = [r.asDict() for r in silver.where(F.col("region") == "QA").collect()]
    views = [d["views_count"] for d in data]
    likes = [d["likes_count"] for d in data]
    comments = [d["comments_count"] for d in data]
    assert qa["total_views"] == sum(views)
    assert qa["highest_views"] == max(views)
    assert qa["average_views"] == round(sum(views) / len(views), 2)
    expected_ratio = (sum(likes) + 2 * sum(comments)) / sum(views) * 1000
    assert abs(qa["engagement_ratio"] - expected_ratio) < 1e-9
    # modal category: i%3==0 -> "10" for 7 of 20 items -> top, cast to int
    assert qa["top_category_id"] == 10


def test_engagement_zero_guard(spark):
    # views == 0 -> engagement_ratio 0 (agg:82-84)
    df = spark.createDataFrame(
        [("QA", dt.date(2025, 10, 6), 0, 5, 1, "10")],
        "region string, date date, views_count long, likes_count long, "
        "comments_count long, category_id string",
    )
    out = daily_insights(df).collect()[0]
    assert out["engagement_ratio"] == 0.0


def test_mode_tie_break_deterministic(spark):
    from youtube_trending_data_pipeline_spark.operators.mode import mode_per_group

    df = spark.createDataFrame(
        [("r", "b"), ("r", "b"), ("r", "a"), ("r", "a"), ("r", "c")],
        "g string, v string",
    )
    out = mode_per_group(df, ["g"], "v").collect()
    # tie between a and b (2 each) -> value-ascending tie-break -> "a"
    assert out[0]["mode_v"] == "a"


def test_weekly_insights(spark, bronze_day_path):
    # build 7 days of gold by shifting the single synthetic day
    silver = _silver(spark, bronze_day_path)
    days = [
        silver.withColumn("date", F.date_add(F.lit(RUN_DATE), -i))
        for i in range(7)
    ]
    all_silver = days[0]
    for d in days[1:]:
        all_silver = all_silver.unionByName(d)
    gold = daily_insights(all_silver)
    assert gold.count() == 21
    report = weekly_insights(gold, RUN_DATE, formatted=False)
    rows = report.collect()
    assert [r["region"] for r in rows] == ["DE", "QA", "US"]  # orderBy region
    r0 = rows[0]
    # every day has the same insights -> top_category is the daily mode,
    # and the conditional sums cover all 7 days
    one_day = {r["region"]: r for r in daily_insights(silver).collect()}["DE"]
    assert r0["top_category"] == one_day["top_category_id"]
    assert r0["total_views_for_top_category"] == 7 * one_day["total_views"]
    assert r0["average_engagement_ratio"] == round(one_day["engagement_ratio"], 2)


def test_weekly_formatted_output(spark, bronze_day_path):
    silver = _silver(spark, bronze_day_path)
    gold = daily_insights(silver)
    report = weekly_insights(gold, RUN_DATE, formatted=True)
    row = report.collect()[0]
    assert "," in row["total_views_for_top_category"]  # thousands separators (F9)


def test_new_channels_anti_join(spark, bronze_day_path):
    from youtube_trending_data_pipeline_spark.operators.channels import (
        new_channel_ids,
        new_channels,
    )

    silver = _silver(spark, bronze_day_path)
    known = spark.createDataFrame(
        [(f"ch-QA-{i}",) for i in range(4)] + [(f"ch-US-{i}",) for i in range(4)],
        "id string",
    )
    ids = new_channel_ids(silver, known)
    got = sorted(r["channel_id"] for r in ids.collect())
    assert got == [f"ch-DE-{i}" for i in range(4)]  # dedup within batch (C5)

    fetched = spark.createDataFrame(
        [(f"ch-DE-{i}", f"name{i}", None, dt.datetime(2020, 1, 1), None, None, None, None, None)
         for i in range(4)] + [("ch-QA-0", "known", None, dt.datetime(2020, 1, 1), None, None, None, None, None)],
        "id string, channel_name string, country string, creation_date timestamp_ntz, "
        "made_for_kids boolean, subscribers_count long, views_count long, videos_count long, keywords string",
    )
    out = new_channels(silver, known, fetched)
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {f"ch-DE-{i}" for i in range(4)}  # known id filtered out
    assert rows["ch-DE-0"]["country"] == "Unkown"  # sic default (ing:101)
    assert rows["ch-DE-0"]["made_for_kids"] is False
    assert rows["ch-DE-0"]["subscribers_count"] == 0
    assert rows["ch-DE-0"]["keywords"] == ""


def test_idempotent_partition_overwrite(spark, bronze_day_path, tmp_path):
    from youtube_trending_data_pipeline_spark.sources.tables import (
        overwrite_date_partition,
        partition_exists,
    )

    silver = _silver(spark, bronze_day_path)
    path = str(tmp_path / "videos")
    overwrite_date_partition(silver, path)
    overwrite_date_partition(silver, path)  # re-run: no duplicates (C1)
    back = spark.read.parquet(path)
    assert back.count() == 60
    assert partition_exists(spark, path, RUN_DATE)
    assert not partition_exists(spark, path, dt.date(1999, 1, 1))
