"""applyInPandasWithState: running per-user state across micro-batches
must equal the batch aggregate over the full input."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_trending_data_pipeline_spark.streaming.stateful import (
    running_user_engagement,
)


def test_stateful_running_engagement(spark, tmp_path):
    src = str(tmp_path / "events_src")
    events = spark.createDataFrame(
        [
            (1, 100, 10.50),
            (1, 200, 5.25),
            (2, 150, 1.00),
            (2, 400, 2.75),
            (3, 50, 7.10),
        ],
        "user_id long, ts long, value double",
    )
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = running_user_engagement(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("user_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last update per user = final state
    rows = spark.sql(
        "select user_id, max_by(n_events, last_ts) n, max_by(total_value, last_ts) v,"
        " max(last_ts) t from user_state group by user_id"
    ).collect()
    got = {r["user_id"]: (r["n"], r["v"], r["t"]) for r in rows}
    expected = {
        r["user_id"]: (r["n"], r["v"], r["t"])
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("v"),
            F.max("ts").alias("t"),
        )
        .collect()
    }
    assert got == expected
