"""Gap-based sessionization — batch formulation.

Classic two-window construction: a row starts a new session when the gap
to the previous event of the same user exceeds the threshold; the running
sum of start flags is the session ordinal. One shuffle on the user key +
partition-local sort; session ids are deterministic (ordinal per user).

The streaming-native equivalent is ``applyInPandasWithState`` /
``session_window``; this batch operator covers the lakehouse backfill
path and is oracle-checkable in ANSI SQL (catalog entry ``sessionize``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    gap: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Append a ``session_id`` column: ``<user ordinal>`` per user.

    ``ts_col`` may be any orderable numeric/timestamp; ``gap`` is in the
    same units (e.g. nanoseconds for the testdata's long-nanos ts).
    """
    order = [ts_col] + ([order_tiebreak] if order_tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    new_session = (
        prev_ts.isNull() | ((F.col(ts_col) - prev_ts) > F.lit(gap))
    ).cast("long")
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    events: DataFrame, user_col: str, ts_col: str, gap: int
) -> DataFrame:
    """Per-session aggregate: event count and duration (ts units)."""
    s = sessionize(events, user_col, ts_col, gap)
    return s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration"),
    )
