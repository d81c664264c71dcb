"""Streaming state introspection (Spark 4 `statestore` reader): the ops
surface that lets an on-call engineer open a live checkpoint's state
store as a DataFrame — state-size audits, skewed-key hunts, corruption
triage — without touching the running query. Verified here by checking
the introspected state equals the batch aggregate."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def test_statestore_reader_matches_batch_aggregate(spark):
    src = tempfile.mkdtemp(prefix="ss-src-")
    ckpt = tempfile.mkdtemp(prefix="ss-ckpt-")
    data = spark.range(1000).select(
        (F.col("id") % 37).alias("k"), F.col("id").alias("v")
    )
    data.write.mode("overwrite").parquet(src)
    q = (
        spark.readStream.schema("k long, v long")
        .parquet(src)
        .groupBy("k")
        .count()
        .writeStream.format("memory")
        .queryName("ss_introspect")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    state = (
        spark.read.format("statestore")
        .load(ckpt)
        .select(F.col("key.k").alias("k"), F.col("value.count").alias("n"))
    )
    got = sorted(tuple(r) for r in state.collect())
    want = sorted(
        tuple(r)
        for r in data.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert got == want


def test_statestore_reader_exposes_partition_layout(spark):
    """partition_id is part of the schema — the column a skewed-state
    hunt groups by at scale."""
    src = tempfile.mkdtemp(prefix="ss-src2-")
    ckpt = tempfile.mkdtemp(prefix="ss-ckpt2-")
    spark.range(100).select((F.col("id") % 5).alias("k")).write.mode(
        "overwrite"
    ).parquet(src)
    q = (
        spark.readStream.schema("k long")
        .parquet(src)
        .groupBy("k")
        .count()
        .writeStream.format("noop")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    state = spark.read.format("statestore").load(ckpt)
    assert "partition_id" in state.columns
    per_part = state.groupBy("partition_id").count().collect()
    assert sum(r["count"] for r in per_part) == 5
