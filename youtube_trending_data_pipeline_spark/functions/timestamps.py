"""Timestamp normalization matching the reference's naive-UTC policy.

The reference strips the trailing ``Z`` and keeps a naive datetime
(dags/trending_daily_ingestion.py:44-45); with the session timezone pinned
to UTC (session.py) this is byte-identical to parsing into TimestampNTZ.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_naive_utc(ts: Column | str) -> Column:
    """ISO-8601 string with optional trailing Z -> TimestampNTZ (naive UTC)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.to_timestamp_ntz(F.regexp_replace(c, "Z$", ""))
