"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as the union-merge formulation (SURVEY brief: compose from
existing DataFrame ops when semantics allow): tag right rows, union with
left rows, sort within each key partition by (ts, side), and carry the
latest right payload forward with ``last(ignorenulls=True)`` over an
unbounded-preceding window. That is exactly one shuffle on the join key +
a partition-local sort — the same cost shape as a sort-merge join, with
no range-explosion and no skew beyond the key distribution itself.

Backward direction (match the most recent right row with
``right_ts <= left_ts``) — the semantics of DuckDB/pandas ``ASOF JOIN``,
which the catalog uses as the oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    direction: str = "backward",
    tolerance: int | float | None = None,
) -> DataFrame:
    """For every left row, attach the payload of the matching right row
    within the same key group (NULLs if none):

    - ``direction="backward"`` (default): latest right row with
      ``right_ts <= left_ts`` — DuckDB/pandas ASOF semantics.
    - ``direction="forward"``: earliest right row with
      ``right_ts >= left_ts`` (next-event attribution).
    - ``tolerance``: maximum |left_ts - matched_ts| (same units as the
      ts columns); a match farther away is nulled out — pandas
      ``merge_asof(tolerance=...)`` semantics. Implemented by carrying
      the matched ts alongside the payload in the same window pass, so
      the cost shape is unchanged (no extra shuffle).

    ``right`` must be unique per (keys, right_ts) — pre-aggregate if not,
    or the carried payload among equal timestamps is unspecified.

    ``_rts`` is a RESERVED name: the payload struct carries the matched
    right timestamp under it for the tolerance gap, so a payload column
    of that name would create duplicate struct fields and silently
    resolve to the wrong one — rejected loudly instead.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = list(keys)
    payload_cols = list(payload_cols)
    if "_rts" in payload_cols:
        raise ValueError(
            "payload column name '_rts' is reserved (internal matched-"
            "timestamp field); rename the column before the as-of join"
        )

    # Sort position of right rows at equal ts decides inclusivity: before
    # left for backward (<=), after left for forward (>=).
    r_side = 0 if direction == "backward" else 2
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(r_side).alias("_side"),
        F.struct(
            F.col(right_ts).alias("_rts"),
            *[F.col(c) for c in payload_cols],
        ).alias("_payload"),
    )
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left_row"),
    )
    unioned = r_tagged.withColumn("_left_row", F.lit(None).cast(l_tagged.schema["_left_row"].dataType)).unionByName(
        l_tagged.withColumn("_payload", F.lit(None).cast(r_tagged.schema["_payload"].dataType))
    )
    order = Window.partitionBy(*keys).orderBy("_ts", "_side")
    if direction == "backward":
        w = order.rowsBetween(Window.unboundedPreceding, 0)
        carried = unioned.withColumn(
            "_matched", F.last("_payload", ignorenulls=True).over(w)
        )
    else:
        w = order.rowsBetween(0, Window.unboundedFollowing)
        carried = unioned.withColumn(
            "_matched", F.first("_payload", ignorenulls=True).over(w)
        )
    matched = F.col("_matched")
    if tolerance is not None:
        gap = F.abs(F.col("_ts") - F.col("_matched")["_rts"])
        matched = F.when(gap <= F.lit(tolerance), F.col("_matched"))
    out = carried.where(F.col("_side") == 1).select(
        F.col("_left_row.*"),
        *[matched[c].alias(f"asof_{c}") for c in payload_cols],
    )
    return out
