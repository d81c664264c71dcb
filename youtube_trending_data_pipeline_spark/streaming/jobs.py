"""Structured Streaming variants of the pipeline (SURVEY §2.9, §7 stretch).

The reference is a once-a-day micro-batch (cron "45 23 * * *",
dags/trending_daily_ingestion.py:223); the streaming-native re-expression
is a file-source stream over the bronze landing directory with an
``availableNow`` trigger — same code path for continuous and catch-up
runs, and checkpointing replaces the reference's existence-probe
idempotency branch (ing:47-55) with exactly-once file-source progress.

Watermarked tumbling-window aggregation is included for the event-stream
shape (absent in the reference, first-class in the engine).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructField, StructType

from youtube_trending_data_pipeline_spark.operators.flatten import flatten_videos
from youtube_trending_data_pipeline_spark.schemas import VIDEO_LIST_RESPONSE


def stream_bronze_to_silver(
    spark: SparkSession,
    bronze_dir: str,
    silver_dir: str,
    checkpoint_dir: str,
    run_date: dt.date,
    regions: list[str] | None = None,
) -> StreamingQuery:
    """File-source stream: bronze day-files -> silver videos parquet.

    ``availableNow`` processes everything currently in the directory then
    stops — the streaming-native daily batch. The checkpoint makes re-runs
    exactly-once (files already processed are skipped), subsuming the
    reference's branch-skip idempotency (C1).
    """
    regions = regions or ["QA", "US", "DE"]
    schema = StructType([StructField(r, VIDEO_LIST_RESPONSE) for r in regions])
    raw = (
        spark.readStream.schema(schema)
        .option("multiLine", True)
        .option("maxFilesPerTrigger", 64)
        .json(bronze_dir)
    )
    stacked = raw.select(
        F.explode(
            F.map_filter(
                F.create_map(*[x for r in regions for x in (F.lit(r), F.col(r))]),
                lambda _, v: v.isNotNull(),
            )
        ).alias("region", "response")
    ).select("region", F.explode("response.items").alias("item"))
    silver = flatten_videos(stacked, run_date)
    return (
        silver.writeStream.format("parquet")
        .option("path", silver_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("date")
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window aggregate over a (streaming) event frame.

    Late rows beyond ``watermark`` are dropped and window state is evicted
    — bounded state regardless of stream length, the streaming analogue of
    the gold daily_insights aggregation.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: right rows within ``(left_ts, left_ts +
    within]`` of a matching-key left row (view→click attribution shape).

    ``how='leftOuter'`` keeps unmatched left rows: the state store emits
    them with null right columns once the watermark passes their join
    bound, so "views that never converted" is computable continuously —
    the same bounded-state guarantee as the inner join, plus a
    watermark-delayed null emission.

    Both sides are watermarked so the join state store evicts rows once
    they can no longer match — bounded state on unbounded streams, which
    is what makes this runnable continuously at scale (absent from the
    reference, whose closest analogue is the daily batch cadence,
    SURVEY §2.9). The time-bound condition is mandatory for streaming
    inner joins precisely because it bounds state.

    Works identically on batch frames (the test asserts equivalence).
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] > lw[left_ts])
        & (rw[right_ts] <= F.expr(f"{left_ts} + interval {within}"))
    )
    return lw.join(rw, cond, how)


def stream_upsert_snapshot(
    spark,
    src_dir: str,
    snapshot_dir: str,
    checkpoint_dir: str,
    key: str,
    ver_col: str,
):
    """Streaming CDC upsert: maintain a latest-row-per-key snapshot table
    from an append-only change stream, without a MERGE-capable format.

    Each micro-batch unions the existing snapshot with the new changes and
    keeps the max-``ver_col`` row per key (ties: the incoming row wins via
    the is_new flag) — the same argmax-dedup as the cdc_latest_per_key
    catalog query. foreachBatch gives exactly-once: the checkpoint tracks
    which source files each batch consumed, so re-runs are no-ops. The
    union is materialized (localCheckpoint) before overwriting the path it
    was read from. At scale the overwrite unit would be the key-hash
    partition directory, not the whole snapshot.
    """
    from pyspark.sql import Window as W

    def upsert(batch_df, batch_id):
        b = batch_df.withColumn("__new", F.lit(1))
        try:
            old = batch_df.sparkSession.read.parquet(snapshot_dir).withColumn(
                "__new", F.lit(0)
            )
            all_rows = old.unionByName(b)
        except Exception:
            all_rows = b
        w = W.partitionBy(key).orderBy(F.desc(ver_col), F.desc("__new"))
        latest = (
            all_rows.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", "__new")
            .localCheckpoint(eager=True)  # materialize before overwriting source
        )
        latest.write.mode("overwrite").parquet(snapshot_dir)

    return (
        spark.readStream.schema(
            spark.read.parquet(src_dir).schema
        ).parquet(src_dir)
        .writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
