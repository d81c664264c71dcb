"""ISO-8601 duration parsing as a pure column expression.

The reference parses ``contentDetails.duration`` strings like ``"PT3M59S"``
with the ``isodate`` package and truncates to integer seconds
(dags/trending_daily_ingestion.py:40-42, used at :173). Spark has no
builtin for ISO-8601 *durations* (only intervals), and a row-at-a-time
Python UDF would be the slow path — so we decompose the grammar with
``regexp_extract`` into pure JVM arithmetic that whole-stage codegen
compiles. Handles the full designator set the YouTube API can emit:
``P[nD][T[nH][nM][nS]]`` plus weeks ``PnW``; fractional seconds truncate
toward zero exactly like ``int(total_seconds())``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _num(c: Column, pat: str) -> Column:
    # regexp_extract returns '' on no-match; try_cast('') -> NULL -> 0
    # (plain cast would throw under Spark 4 ANSI mode)
    return F.coalesce(F.regexp_extract(c, pat, 1).try_cast("double"), F.lit(0.0))


def iso8601_duration_seconds(duration: Column | str) -> Column:
    """Seconds (LongType) from an ISO-8601 duration string; NULL in -> NULL out."""
    c = F.col(duration) if isinstance(duration, str) else duration
    days = _num(c, r"(\d+)D")
    weeks = _num(c, r"(\d+)W")
    # Time components appear only after the 'T' separator; H/M/S letters
    # cannot occur in the date part of YouTube durations, but anchor on T
    # anyway so "P1M" (month) is never misread as minutes.
    time_part = F.regexp_extract(c, r"T(.*)$", 1)
    hours = _num(time_part, r"(\d+)H")
    minutes = _num(time_part, r"(\d+(?:\.\d+)?)M")
    seconds = _num(time_part, r"(\d+(?:\.\d+)?)S")
    total = (
        weeks * 604800.0 + days * 86400.0 + hours * 3600.0 + minutes * 60.0 + seconds
    )
    return F.when(c.isNotNull(), total.cast("long")).otherwise(F.lit(None).cast("long"))
