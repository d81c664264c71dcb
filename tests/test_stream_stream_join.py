"""Stream-stream interval join: streaming result must equal the batch join
with the same predicate (SURVEY §2.9 extension — the reference has no
streaming; the engine makes the attribution-join shape continuous)."""

from __future__ import annotations

import datetime as dt
import uuid

from youtube_trending_data_pipeline_spark.streaming.jobs import interval_join_streams


def _frames(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    views = [
        (u, base + dt.timedelta(minutes=m))
        for u, m in [(1, 0), (1, 90), (2, 10), (3, 20)]
    ]
    clicks = [
        (u, base + dt.timedelta(minutes=m))
        # u1: one click 30min after first view (matches view@0 only);
        # u2: click 70min after view -> outside 1h bound; u4: no view.
        for u, m in [(1, 30), (1, 100), (2, 80), (4, 15)]
    ]
    vdf = spark.createDataFrame(views, "user_id long, view_ts timestamp")
    cdf = spark.createDataFrame(clicks, "user_id long, click_ts timestamp")
    vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
    vdf.write.parquet(vdir)
    cdf.write.parquet(cdir)
    return vdf, cdf, vdir, cdir


def test_stream_join_matches_batch(spark, tmp_path):
    vdf, cdf, vdir, cdir = _frames(spark, tmp_path)

    # batch reference: the same helper on batch frames (no watermark branch)
    batch_rows = {
        (r.user_id, r.view_ts, r.click_ts)
        for r in interval_join_streams(
            vdf, cdf.alias("r"), "user_id", "view_ts", "click_ts"
        )
        .select(vdf["user_id"], "view_ts", "click_ts")
        .collect()
    }
    assert (1, dt.datetime(2024, 1, 1, 0, 0), dt.datetime(2024, 1, 1, 0, 30)) in batch_rows
    assert all(u != 2 for (u, _, _) in batch_rows)  # 70min gap excluded
    assert all(u != 4 for (u, _, _) in batch_rows)  # clicks without views drop

    vs = spark.readStream.schema(vdf.schema).parquet(vdir)
    cs = spark.readStream.schema(cdf.schema).parquet(cdir)
    joined = interval_join_streams(vs, cs.alias("r"), "user_id", "view_ts", "click_ts")
    name = f"ssj_{uuid.uuid4().hex[:8]}"
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
    stream_rows = {
        (r.user_id, r.view_ts, r.click_ts) for r in spark.table(name).collect()
    }
    assert stream_rows == batch_rows
