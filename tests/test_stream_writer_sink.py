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
