"""Stream-static join: enrich a stream with a batch dimension table —
the everyday production shape (events + user/product dim) that needs no
watermark because the static side is fully known each micro-batch; Spark
re-plans it per batch and broadcasts the dim.  Result must equal the
batch join over the same inputs."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    events = spark.createDataFrame(
        [(1, "click", 2.0), (2, "view", 1.0), (3, "click", 4.0), (9, "view", 5.0)],
        "user_id long, event_type string, value double",
    )
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver"), (3, "gold")],  # user 9 has no tier
        "user_id long, tier string",
    )
    src = str(tmp_path / "events")
    events.write.parquet(src)

    batch = {
        (r.tier, r.n)
        for r in events.join(dim, "user_id")  # inner: untiered users drop
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    stream = spark.readStream.schema(events.schema).parquet(src)
    enriched = stream.join(F.broadcast(dim), "user_id").groupBy("tier").agg(
        F.count(F.lit(1)).alias("n")
    )
    name = f"ssd_{uuid.uuid4().hex[:8]}"
    q = (
        enriched.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.tier, r.n) for r in spark.table(name).collect()}
    assert got == batch
    assert ("gold", 2) in got and ("silver", 1) in got
