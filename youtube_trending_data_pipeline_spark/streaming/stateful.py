"""Custom stateful streaming operator via ``applyInPandasWithState``.

Running per-user engagement state: for every micro-batch, each user's
event count / value total / last-seen timestamp are folded into persistent
state, and the operator emits one updated summary row per user per batch.
State lives in the state store (RocksDB/HDFS-backed on a cluster),
partitioned by the grouping key — the engine's demonstration of the
"custom stateful operator" extension point (SURVEY §2.9 was empty in the
reference; Structured Streaming makes this first-class).

Processing-time timeout evicts users idle longer than ``ttl_ms``
(bounded state — mandatory at 100 TB event volumes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_v100", LongType()),
        StructField("last_ts", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", LongType()),
    ]
)


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, total, last = state.get if state.exists else (0, 0, 0)
    for pdf in batches:
        n += len(pdf)
        # exact integer cents per element — same bit-determinism policy as
        # the batch side (catalog.cents): round each value, sum as int64
        total += int((pdf["value"] * 100).round().astype("int64").sum())
        last = max(last, int(pdf["ts"].max()))
    state.update((n, total, last))
    state.setTimeoutDuration(3_600_000)  # evict after 1 h idle
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total / 100.0],
            "last_ts": [last],
        }
    )


def running_user_engagement(events_stream: DataFrame) -> DataFrame:
    """events stream (user_id, ts: long, value: double) -> per-user running
    summary, one row per user per micro-batch (Update output mode)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
