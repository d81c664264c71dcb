"""PySpark 4 Python DataSource for REST-shaped ingestion (S1/S2 as a
first-class Spark format): registration, per-region executor-side
partitions, missing-region guard, and exact equivalence with the bronze
day-file scan path."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_day_json

from youtube_trending_data_pipeline_spark.schemas import VIDEO_LIST_RESPONSE
from youtube_trending_data_pipeline_spark.sources.bronze import read_bronze_day
from youtube_trending_data_pipeline_spark.sources.datasource import (
    TrendingVideosDataSource,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(TrendingVideosDataSource)
    return spark


def _load(spark, day_file, regions):
    return (
        spark.read.format("trending_videos")
        .option("regions", regions)
        .option("day_file", day_file)
        .load()
    )


def test_reads_one_row_per_present_region(registered, bronze_day_path):
    df = _load(registered, bronze_day_path, "QA,US,DE")
    rows = {r.region: r.payload for r in df.collect()}
    assert set(rows) == {"QA", "US", "DE"}
    for payload in rows.values():
        parsed = json.loads(payload)
        assert parsed["kind"] == "youtube#videoListResponse"
        assert len(parsed["items"]) == 20


def test_missing_region_yields_no_row(registered, bronze_day_path):
    df = _load(registered, bronze_day_path, "QA,XX")
    assert [r.region for r in df.collect()] == ["QA"]


def test_one_partition_per_region(registered, bronze_day_path):
    df = _load(registered, bronze_day_path, "QA,US,DE")
    # each region is an InputPartition: fetch parallelism == region count
    assert df.rdd.getNumPartitions() == 3


def test_datasource_path_equals_file_scan_path(registered, bronze_day_path):
    """Parsing the DataSource payload with the bronze schema must produce
    the identical (region, item-id) demultiplex as read_bronze_day — the
    two ingestion paths (live fetch vs archived day-file) are one
    pipeline."""
    via_ds = (
        _load(registered, bronze_day_path, "QA,US,DE")
        .select(
            "region",
            F.from_json("payload", VIDEO_LIST_RESPONSE).alias("response"),
        )
        .select("region", F.explode("response.items").alias("item"))
        .select("region", F.col("item.id").alias("vid"))
    )
    via_file = (
        read_bronze_day(registered, bronze_day_path, ["QA", "US", "DE"])
        .select("region", F.explode("response.items").alias("item"))
        .select("region", F.col("item.id").alias("vid"))
    )
    a = sorted(tuple(r) for r in via_ds.collect())
    b = sorted(tuple(r) for r in via_file.collect())
    assert a == b and len(a) == 60


def test_option_validation(registered, bronze_day_path):
    with pytest.raises(Exception):
        registered.read.format("trending_videos").option(
            "day_file", bronze_day_path
        ).load().collect()  # no regions
    with pytest.raises(Exception):
        registered.read.format("trending_videos").option(
            "regions", "QA"
        ).load().collect()  # no fetcher source


def test_streaming_day_backfill(registered, tmp_path):
    """trending_days: two recorded days stream through availableNow; the
    materialized batches equal the union of both day files, and the
    day column tracks the source file."""
    from tests.conftest import make_day_json
    from youtube_trending_data_pipeline_spark.sources.datasource import (
        TrendingDaysStreamDataSource,
    )

    registered.dataSource.register(TrendingDaysStreamDataSource)
    d = tmp_path / "days"
    d.mkdir()
    for day in ("2025-10-06", "2025-10-07"):
        (d / f"{day}.json").write_text(json.dumps(make_day_json()))
    out = []
    q = (
        registered.readStream.format("trending_days")
        .option("dir", str(d))
        .option("regions", "QA,US,DE")
        .load()
        .writeStream.format("memory")
        .queryName("trending_days_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = registered.sql(
        "SELECT day, region, count(*) AS n FROM trending_days_test "
        "GROUP BY day, region"
    ).collect()
    got = {(r.day, r.region) for r in rows}
    assert got == {
        (day, region)
        for day in ("2025-10-06", "2025-10-07")
        for region in ("QA", "US", "DE")
    }
    payload = registered.sql(
        "SELECT payload FROM trending_days_test LIMIT 1"
    ).collect()[0].payload
    assert json.loads(payload)["kind"] == "youtube#videoListResponse"


def test_streaming_offsets_are_content_based(tmp_path):
    """The ADVICE-r5 backfill scenario, at the reader level: after day 07
    is consumed, a day-file that SORTS BEFORE it (06) arrives late. A
    positional index would mistake 06 for already-consumed (and on
    restart replay 06 under 07's index); the content-based offset picks
    it up as the next batch, and readBetweenOffsets replays exactly each
    committed batch's file set even after the late add. Deleting a
    committed file makes replay fail loudly instead of returning the
    wrong rows."""
    from tests.conftest import make_day_json
    from youtube_trending_data_pipeline_spark.sources.datasource import (
        TrendingDaysStreamReader,
    )

    d = tmp_path / "days"
    d.mkdir()
    (d / "2025-10-07.json").write_text(json.dumps(make_day_json()))
    reader = TrendingDaysStreamReader({"dir": str(d), "regions": "QA,US"})

    o0 = reader.initialOffset()
    rows1, o1 = reader.read(o0)
    assert {r[0] for r in rows1} == {"2025-10-07"}
    assert o1 == {"consumed": ["2025-10-07.json"]}

    # late backfill: an older day lands after a newer one was committed
    (d / "2025-10-06.json").write_text(json.dumps(make_day_json()))
    rows2, o2 = reader.read(o1)
    assert {r[0] for r in rows2} == {"2025-10-06"}
    assert o2 == {"consumed": ["2025-10-06.json", "2025-10-07.json"]}

    # replay is the set difference of offsets, unaffected by the late add
    assert {r[0] for r in reader.readBetweenOffsets(o0, o1)} == {"2025-10-07"}
    assert {r[0] for r in reader.readBetweenOffsets(o1, o2)} == {"2025-10-06"}

    # nothing new -> empty batch, offset unchanged
    rows3, o3 = reader.read(o2)
    assert rows3 == [] and o3 == o2

    # committed file deleted -> replay must fail loudly, not under-emit
    (d / "2025-10-07.json").unlink()
    with pytest.raises(FileNotFoundError):
        reader.readBetweenOffsets(o0, o1)

    # pre-round-6 positional checkpoints are rejected explicitly
    with pytest.raises(ValueError):
        reader.read({"index": 1})


def test_report_sender_writer_delivers_per_partition(registered, tmp_path):
    """report_sender: rows written through the Spark writer land as audit
    files via the FileReportSender seam — one file per (subject) row,
    delivered executor-side."""
    from youtube_trending_data_pipeline_spark.sources.datasource import (
        ReportSenderDataSource,
    )

    registered.dataSource.register(ReportSenderDataSource)
    out = tmp_path / "sent"
    df = registered.createDataFrame(
        [
            ("Weekly Report QA", "<h1>qa</h1>", "a@x.com,b@x.com"),
            ("Weekly Report US", "<h1>us</h1>", "c@x.com"),
        ],
        "subject string, html string, recipients string",
    ).repartition(2)
    df.write.format("report_sender").option("out_dir", str(out)).mode(
        "append"
    ).save()
    files = sorted(p.name for p in out.iterdir())
    assert files == ["weekly-report-qa.html", "weekly-report-us.html"]
    assert (out / "weekly-report-qa.html").read_text() == "<h1>qa</h1>"


def test_streaming_checkpoint_restart_picks_up_backfill(registered, tmp_path):
    """Full restart path over the content-based offsets: run the stream
    to completion with a checkpoint into a FILE sink (memory sinks
    don't support recovery), STOP it, drop in a day-file that sorts
    BEFORE the consumed one (the backfill), restart from the same
    checkpoint — only the new file's rows arrive, nothing replays."""
    from youtube_trending_data_pipeline_spark.sources.datasource import (
        TrendingDaysStreamDataSource,
    )

    registered.dataSource.register(TrendingDaysStreamDataSource)
    d = tmp_path / "days"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    (d / "2025-10-07.json").write_text(json.dumps(make_day_json()))

    def run_once():
        q = (
            registered.readStream.format("trending_days")
            .option("dir", str(d))
            .option("regions", "QA,US")
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = registered.read.parquet(out_dir).groupBy("day").count().collect()
    assert {(r.day, r["count"]) for r in first} == {("2025-10-07", 2)}

    # backfill an OLDER day, restart from the same checkpoint
    (d / "2025-10-06.json").write_text(json.dumps(make_day_json()))
    run_once()
    second = registered.read.parquet(out_dir).groupBy("day").count().collect()
    # exactly-once across restarts: the old day appears ONCE (no
    # replay), the backfilled older day arrives
    assert {(r.day, r["count"]) for r in second} == {
        ("2025-10-07", 2),
        ("2025-10-06", 2),
    }
