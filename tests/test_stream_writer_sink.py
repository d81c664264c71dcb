"""The Python DataSource STREAM WRITER quadrant (alert_sink): two-phase
per-batch publication with manifest-gated visibility — staged files are
invisible until commit, re-commits are no-ops, aborted stages never
surface."""

from __future__ import annotations

import json
import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from youtube_trending_data_pipeline_spark.sources.datasource import (
    AlertSinkDataSource,
    AlertStreamWriter,
    _AlertBatchCommit,
    read_alert_sink,
)


def test_stream_writer_end_to_end(spark):
    """availableNow file stream -> alert_sink: every input row is
    published exactly once, batch manifests exist, and nothing outside
    a manifest is visible."""
    spark.dataSource.register(AlertSinkDataSource)
    src = tempfile.mkdtemp(prefix="alert-src-")
    sink = tempfile.mkdtemp(prefix="alert-sink-")
    ckpt = tempfile.mkdtemp(prefix="alert-ckpt-")
    rows = [(f"s{i}", f"body {i}") for i in range(25)]
    spark.createDataFrame(rows, "subject string, body string").coalesce(
        2
    ).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("subject string, body string")
        .parquet(src)
        .writeStream.format("alert_sink")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination(120)
    got = read_alert_sink(sink)
    assert sorted(r["subject"] for r in got) == sorted(s for s, _ in rows)
    manifests = [f for f in os.listdir(sink) if f.endswith(".manifest")]
    assert manifests  # at least one published batch


def test_recommit_is_noop_and_abort_cleans(spark):
    """Driving the writer directly: a second commit of the same batch id
    does not change the manifest; aborted staged files never become
    visible."""
    sink = tempfile.mkdtemp(prefix="alert-proto-")
    w = AlertStreamWriter({"path": sink})

    class Row:
        def __init__(self, subject, body):
            self._d = {"subject": subject, "body": body}

        def asDict(self):
            return self._d

    m1 = w.write(iter([Row("a", "1"), Row("b", "2")]))
    w.commit([m1], batchId=0)
    first = read_alert_sink(sink)
    # re-delivery: same batch id re-staged then re-committed
    m1b = w.write(iter([Row("a", "1"), Row("b", "2")]))
    w.commit([m1b], batchId=0)
    assert read_alert_sink(sink) == first  # manifest written once wins
    # the duplicate stage the re-delivery wrote is garbage-collected by
    # the no-op re-commit (no unbounded _staging growth across restarts)
    assert not os.path.exists(os.path.join(sink, "_staging", m1b.part_file))
    # while the originally manifested file survives
    assert os.path.exists(os.path.join(sink, "_staging", m1.part_file))
    # a retried commit carrying the ORIGINAL messages must NOT delete
    # the published file the manifest names
    w.commit([m1], batchId=0)
    assert os.path.exists(os.path.join(sink, "_staging", m1.part_file))
    assert read_alert_sink(sink) == first
    # abort: staged file removed, nothing published
    m2 = w.write(iter([Row("z", "9")]))
    w.abort([m2], batchId=1)
    assert sorted(r["subject"] for r in read_alert_sink(sink)) == ["a", "b"]
    assert not os.path.exists(
        os.path.join(sink, "_staging", m2.part_file)
    )


def test_unmanifested_stage_invisible(spark):
    """A crash between stage and commit leaves data invisible (the
    exactly-once half the manifest provides)."""
    sink = tempfile.mkdtemp(prefix="alert-crash-")
    w = AlertStreamWriter({"path": sink})

    class Row:
        def __init__(self, s):
            self._d = {"subject": s, "body": s}

        def asDict(self):
            return self._d

    w.write(iter([Row("ghost")]))  # staged, never committed
    assert read_alert_sink(sink) == []


def test_streaming_alert_pipeline_end_to_end(spark):
    """The full alerting pipeline: watermarked windowed counts ->
    threshold filter -> alert_sink. Every window crossing the
    threshold in the input produces exactly one manifested alert row;
    no sub-threshold window alerts."""
    from youtube_trending_data_pipeline_spark.sources.datasource import (
        AlertSinkDataSource,
    )
    from youtube_trending_data_pipeline_spark.streaming.jobs import (
        windowed_event_counts,
    )

    spark.dataSource.register(AlertSinkDataSource)
    src = tempfile.mkdtemp(prefix="alertpipe-src-")
    sink = tempfile.mkdtemp(prefix="alertpipe-sink-")
    ckpt = tempfile.mkdtemp(prefix="alertpipe-ckpt-")
    HOUR = 3600 * 1000000
    rows, eid = [], 0
    # hour 0: 10 clicks (alert at threshold 5); hour 1: 2 clicks (quiet);
    # hour 2: 7 errors (alert)
    for n, hour, ty in ((10, 0, "click"), (2, 1, "click"), (7, 2, "error")):
        for i in range(n):
            eid += 1
            rows.append((eid, 1, hour * HOUR + i, ty, 1.0, "{}"))
    # watermark flush: a single late event at hour 6 advances the
    # watermark to hour 4, closing hours 0-2 (the no-data microbatch
    # then emits them before availableNow terminates)
    eid += 1
    rows.append((eid, 1, 6 * HOUR, "flush", 1.0, "{}"))
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, event_type string, "
        "value double, props string"
    ).selectExpr(
        "event_id", "timestamp_micros(ts_us) AS ts", "user_id",
        "event_type", "value", "props",
    ).write.mode("overwrite").parquet(src)
    events = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(src)
    alerts = (
        windowed_event_counts(events, window="1 hour", watermark="2 hours")
        .where(F.col("n_events") >= 5)
        .select(
            F.concat_ws(
                ":", "event_type", F.col("window_start").cast("string")
            ).alias("subject"),
            F.concat_ws(
                " ", F.lit("count"), F.col("n_events").cast("string")
            ).alias("body"),
        )
    )
    q = (
        alerts.writeStream.format("alert_sink")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = read_alert_sink(sink)
    bodies = {r["subject"].split(":")[0]: r["body"] for r in got}
    # append mode emits only watermark-closed windows; with availableNow
    # the final watermark closes hours 0 (and possibly 1/2 depending on
    # max event time). Hour 0 click window MUST be present; the quiet
    # hour-1 window must never alert.
    assert any(s.startswith("click") for s in bodies)
    assert bodies.get("click") == "count 10"
    assert all(not r["subject"].startswith("click:1970-01-01 01")
               for r in got)
