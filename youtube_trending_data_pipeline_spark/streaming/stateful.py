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

import numpy as np
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


def _make_update(ttl_ms: int | None):
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
            # exact integer cents per element — same bit-determinism policy
            # as the batch side (catalog.cents). np.floor(x*100 + 0.5) is
            # round-half-UP, matching Spark's F.round; pandas .round() is
            # half-to-even and would diverge on exact .5 products (ADVICE r1)
            total += int(
                np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype("int64").sum()
            )
            last = max(last, int(pdf["ts"].max()))
        state.update((n, total, last))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total / 100.0],
                "last_ts": [last],
            }
        )

    return _update


def running_user_engagement(
    events_stream: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """events stream (user_id, ts: long, value: double) -> per-user running
    summary, one row per user per micro-batch (Update output mode).

    ``ttl_ms``: idle-state eviction for continuous deployments (bounded
    state at 100 TB event volumes). Leave None for availableNow /
    drain-style runs — a ProcessingTimeTimeout keeps scheduling no-data
    micro-batches to fire timers, so an availableNow query would never
    terminate with a TTL set.
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _make_update(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas: the successor stateful API
# ---------------------------------------------------------------------------


def running_user_engagement_tws(events_stream: DataFrame) -> DataFrame:
    """Same running per-user engagement fold as
    :func:`running_user_engagement`, expressed through Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    applyInPandasWithState (SPARK-49564): per-key TYPED state handles
    (ValueState / ListState / MapState) with schema'd values instead of
    one opaque tuple, an object-oriented StatefulProcessor lifecycle
    (init/handleInputRows/close), native state TTL, and timers — the
    API new stateful operators should target; the applyInPandasWithState
    form above is kept as the compatibility path. Emits one updated
    summary row per user per micro-batch (Update mode). Exact integer
    cents, same bit-determinism policy as the batch side.

    Runtime requirements beyond applyInPandasWithState: the RocksDB
    state-store provider and the ``protobuf`` package (the
    transformWithState state-server protocol is protobuf-framed) —
    absent protobuf the query fails at initialization, so the test is
    import-gated like the optional multimodal decoders."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class EngagementProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            n, total, last = (
                self._state.get() if self._state.exists() else (0, 0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                total += int(
                    np.floor(pdf["value"].to_numpy() * 100 + 0.5)
                    .astype("int64")
                    .sum()
                )
                last = max(last, int(pdf["ts"].max()))
            self._state.update((n, total, last))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [total / 100.0],
                    "last_ts": [last],
                }
            )

        def close(self) -> None:
            pass

    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=EngagementProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
