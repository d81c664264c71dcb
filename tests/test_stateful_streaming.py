"""applyInPandasWithState: running per-user state across micro-batches
must equal the batch aggregate over the full input."""

from __future__ import annotations

import pytest
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


def test_transform_with_state_matches_apply_in_pandas_path(spark, tmp_path):
    """The Spark-4 transformWithStateInPandas form must produce the same
    final per-user state as the applyInPandasWithState form and the
    batch aggregate. transformWithState requires the RocksDB state store
    provider (set for this query only) AND the protobuf wheel for its
    state-server wire protocol — skipped where protobuf isn't installed
    (this container), the same import-gate policy as the optional
    decoders."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's state protocol needs protobuf",
    )
    src = str(tmp_path / "events_src_tws")
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

    from youtube_trending_data_pipeline_spark.streaming.stateful import (
        running_user_engagement_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(events.schema).parquet(src)
        out = running_user_engagement_tws(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("user_state_tws")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    rows = spark.sql(
        "select user_id, max_by(n_events, last_ts) n,"
        " max_by(total_value, last_ts) v, max(last_ts) t"
        " from user_state_tws group by user_id"
    ).collect()
    got = {r["user_id"]: (r["n"], r["v"], r["t"]) for r in rows}
    expected = {
        r["user_id"]: (r["n"], r["v"], r["t"])
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
                "v"
            ),
            F.max("ts").alias("t"),
        )
        .collect()
    }
    assert got == expected
