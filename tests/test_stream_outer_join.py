"""Stream-stream LEFT OUTER interval join: unmatched left rows must be
emitted with null right columns once the watermark passes their join
bound — the continuous form of "views that never converted".  The
watermark-pusher row makes the final no-data micro-batch evict and emit
the outer results under trigger(availableNow)."""

from __future__ import annotations

import datetime as dt
import uuid

from youtube_trending_data_pipeline_spark.streaming.jobs import interval_join_streams


def test_stream_left_outer_emits_unmatched(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    views = [
        (1, base),                               # converts at +30min
        (2, base + dt.timedelta(minutes=10)),    # click at +80min: outside 1h
        (3, base + dt.timedelta(minutes=20)),    # never clicks
        # watermark pusher far in the future so every earlier view's
        # bound (view_ts + 1h + 2h watermark) is passed by end of drain
        (99, base + dt.timedelta(hours=12)),
    ]
    clicks = [
        (1, base + dt.timedelta(minutes=30)),
        (2, base + dt.timedelta(minutes=80)),
        (99, base + dt.timedelta(hours=12, minutes=1)),
    ]
    vdf = spark.createDataFrame(views, "user_id long, view_ts timestamp")
    cdf = spark.createDataFrame(clicks, "user_id long, click_ts timestamp")
    vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
    vdf.write.parquet(vdir)
    cdf.write.parquet(cdir)

    vs = spark.readStream.schema(vdf.schema).parquet(vdir)
    cs = spark.readStream.schema(cdf.schema).parquet(cdir)
    joined = interval_join_streams(
        vs, cs.alias("r"), "user_id", "view_ts", "click_ts", how="leftOuter"
    )
    name = f"ssoj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.select(vs["user_id"], "view_ts", "click_ts")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {(r.user_id, r.click_ts is not None) for r in spark.table(name).collect()}

    assert (1, True) in rows          # matched pair
    assert (2, False) in rows         # click outside bound -> outer null
    assert (3, False) in rows         # no click at all -> outer null
    assert (1, False) not in rows     # matched view must NOT also emit null
