"""Streaming dedup with bounded state: dropDuplicatesWithinWatermark keeps
one row per key among events whose event-times fall within the watermark
delay of each other, and evicts state beyond it — the streaming analogue
of the batch exact-dedup operator (operators/dedup.py)."""

from __future__ import annotations

import datetime as dt
import uuid


def test_drop_duplicates_within_watermark(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("k1", base),                              # first sight of k1
        ("k1", base + dt.timedelta(minutes=5)),    # dup within delay -> dropped
        ("k2", base + dt.timedelta(minutes=1)),    # unique key kept
        ("k1", base + dt.timedelta(minutes=7)),    # still within delay -> dropped
    ]
    src = str(tmp_path / "src")
    df = spark.createDataFrame(rows, "key string, ts timestamp")
    df.write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["key"]
    )
    name = f"ddw_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {(r.key) for r in spark.table(name).collect()}
    assert out == {"k1", "k2"}
    assert spark.table(name).count() == 2  # one survivor per key
