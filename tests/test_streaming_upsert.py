"""Streaming CDC upsert via foreachBatch: the snapshot always holds the
latest row per key; checkpointed file progress makes re-runs no-ops
(exactly-once), and later batches overwrite earlier versions."""

from __future__ import annotations


def test_foreach_batch_upsert_latest_wins(spark, tmp_path):
    src = str(tmp_path / "changes")
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    from youtube_trending_data_pipeline_spark.streaming.jobs import (
        stream_upsert_snapshot,
    )

    spark.createDataFrame(
        [(1, 10, "a1"), (2, 10, "b1")], "k long, ver long, payload string"
    ).write.parquet(src)

    q = stream_upsert_snapshot(spark, src, snap, ckpt, "k", "ver")
    q.awaitTermination(120)
    got = {(r.k, r.ver, r.payload) for r in spark.read.parquet(snap).collect()}
    assert got == {(1, 10, "a1"), (2, 10, "b1")}

    # batch 2: update k=1 with a newer version, insert k=3, stale k=2 ignored
    spark.createDataFrame(
        [(1, 20, "a2"), (3, 5, "c1"), (2, 9, "b0-stale")],
        "k long, ver long, payload string",
    ).write.mode("append").parquet(src)  # new part files in the same stream dir
    q = stream_upsert_snapshot(spark, src, snap, ckpt, "k", "ver")
    q.awaitTermination(120)
    got = {(r.k, r.ver, r.payload) for r in spark.read.parquet(snap).collect()}
    assert got == {(1, 20, "a2"), (2, 10, "b1"), (3, 5, "c1")}

    # re-run with no new files: checkpoint makes it a no-op
    q = stream_upsert_snapshot(spark, src, snap, ckpt, "k", "ver")
    q.awaitTermination(120)
    assert {
        (r.k, r.ver, r.payload) for r in spark.read.parquet(snap).collect()
    } == got
