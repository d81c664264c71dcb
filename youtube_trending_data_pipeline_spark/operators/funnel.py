"""Funnel and cohort-retention analytics over event streams.

Classic product-analytics operators the reference's event-shaped data
invites but never implements. Both are pure DataFrame compositions:

* funnel — ordered-step progression per user: step k counts only if it
  occurs strictly after the user's step k-1 time. One min-aggregate per
  step plus a broadcastable per-user join chain (steps are few, users
  shard the shuffle key).
* retention — day-0 cohort by first activity; retention day N = distinct
  users of that cohort active N days later. Two aggregations and one
  equi-join on the user key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    steps: Sequence[tuple[str, Column]],
) -> DataFrame:
    """Per-user earliest timestamp of each funnel step, where step k must
    happen strictly after the user's step k-1 time. Output: one row per
    user who completed step 1, with nullable ``<name>_ts`` per step."""
    name0, cond0 = steps[0]
    out = (
        events.where(cond0)
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts_col).alias(f"{name0}_ts"))
    )
    prev = f"{name0}_ts"
    for name, cond in steps[1:]:
        nxt = (
            events.where(cond)
            .select(F.col(user_col).alias("user"), F.col(ts_col).alias("_t"))
            .join(out.select("user", prev), "user")
            .where(F.col("_t") > F.col(prev))
            .groupBy("user")
            .agg(F.min("_t").alias(f"{name}_ts"))
        )
        out = out.join(nxt, "user", "left")
        prev = f"{name}_ts"
    return out


def funnel_summary(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    steps: Sequence[tuple[str, Column]],
) -> DataFrame:
    """Users reaching each step, in step order: (step, n_users)."""
    per_user = funnel_steps(events, user_col, ts_col, steps)
    counts = [
        per_user.where(F.col(f"{name}_ts").isNotNull())
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.lit(name).alias("step"), F.lit(i + 1).alias("step_idx"), "n_users")
        for i, (name, _) in enumerate(steps)
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str,
    day_col: Column,
    max_days: int = 14,
) -> DataFrame:
    """(cohort_day, day_offset, n_users): users whose FIRST activity was
    cohort_day and who were active again day_offset days later."""
    days = events.select(
        F.col(user_col).alias("user"), day_col.alias("day")
    ).distinct()
    first = days.groupBy("user").agg(F.min("day").alias("cohort_day"))
    joined = days.join(first, "user").select(
        "user", "cohort_day", F.datediff("day", "cohort_day").alias("day_offset")
    )
    return (
        joined.where(F.col("day_offset").between(0, max_days))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user").alias("n_users"))
    )
