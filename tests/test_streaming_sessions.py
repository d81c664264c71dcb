"""Streaming sessionization via F.session_window: gap-based session
aggregation with watermark-bounded state — the streaming form of
operators/sessions.py (batch sessionize), same 30-minute-gap semantics."""

from __future__ import annotations

import datetime as dt
import uuid

from pyspark.sql import functions as F


def test_session_window_stream_matches_batch_gaps(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base), (1, base + dt.timedelta(minutes=10)),          # session A (2 events)
        (1, base + dt.timedelta(minutes=60)),                      # gap>30m -> session B
        (2, base + dt.timedelta(minutes=5)),                       # session C
        # far-future event: advances the watermark past every session end so
        # append mode can emit them (sessions only finalize behind the
        # watermark; nothing would emit otherwise under availableNow)
        (3, base + dt.timedelta(hours=10)),
    ]
    src = str(tmp_path / "ev")
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    df.write.parquet(src)

    # state stores are per shuffle partition; keep the count tiny so the
    # stateful batches don't dominate test wall-clock
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    stream = spark.readStream.schema(df.schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "1 second")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("s_start"),
            "n_events",
        )
    )
    name = f"sw_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    got = {(r.user_id, r.s_start, r.n_events) for r in spark.table(name).collect()}
    assert got == {
        (1, base, 2),
        (1, base + dt.timedelta(minutes=60), 1),
        (2, base + dt.timedelta(minutes=5), 1),
    }  # user 3's flush session stays open (watermark never passes it)
