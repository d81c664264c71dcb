"""Property-based tests (hypothesis): the ISO-8601 duration parser and the
mode operator against independent Python reference implementations."""

from __future__ import annotations

import datetime as dt
import random
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from youtube_trending_data_pipeline_spark.functions.durations import (
    iso8601_duration_seconds,
)
from youtube_trending_data_pipeline_spark.operators.mode import mode_per_group


def _py_duration_seconds(weeks=0, days=0, hours=0, minutes=0, seconds=0.0) -> int:
    return int(
        weeks * 604800 + days * 86400 + hours * 3600 + minutes * 60 + seconds
    )


duration_parts = st.fixed_dictionaries(
    {
        "weeks": st.integers(0, 10),
        "days": st.integers(0, 30),
        "hours": st.integers(0, 48),
        "minutes": st.integers(0, 120),
        "seconds": st.integers(0, 120),
    }
)


@settings(max_examples=30, deadline=None)
@given(parts=duration_parts, frac=st.integers(0, 9))
def test_duration_parser_matches_reference(spark, parts, frac):
    # build the ISO string; omit zero components (like real API payloads),
    # but keep at least one to stay a valid duration
    date_bits = ""
    if parts["weeks"]:
        date_bits += f"{parts['weeks']}W"
    if parts["days"]:
        date_bits += f"{parts['days']}D"
    time_bits = ""
    if parts["hours"]:
        time_bits += f"{parts['hours']}H"
    if parts["minutes"]:
        time_bits += f"{parts['minutes']}M"
    secs = parts["seconds"] + frac / 10
    if parts["seconds"] or not (date_bits or time_bits):
        time_bits += f"{secs}S"
    iso = "P" + date_bits + ("T" + time_bits if time_bits else "")
    expected = _py_duration_seconds(
        parts["weeks"],
        parts["days"],
        parts["hours"],
        parts["minutes"],
        secs if (parts["seconds"] or not (date_bits or time_bits)) else 0,
    )
    df = spark.createDataFrame([(iso,)], "d string")
    got = df.select(iso8601_duration_seconds("d").alias("s")).collect()[0]["s"]
    assert got == expected, iso


@settings(max_examples=15, deadline=None)
@given(
    values=st.lists(st.sampled_from("abcde"), min_size=1, max_size=40),
    seed=st.integers(0, 10_000),
)
def test_mode_matches_counter(spark, values, seed):
    rng = random.Random(seed)
    rows = [("g", v) for v in values]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "g string, v string")
    got = mode_per_group(df, ["g"], "v").collect()[0]["mode_v"]
    counts = Counter(values)
    best = max(counts.values())
    # engine tie-break: among max-count values, lexicographically smallest
    expected = min(v for v, c in counts.items() if c == best)
    assert got == expected


events = st.lists(
    st.tuples(
        st.integers(0, 5),      # user_id
        st.integers(0, 1000),   # event_id
        st.integers(0, 50),     # ts (small range forces ties)
        st.integers(-100, 100), # value_cents
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=25, deadline=None)
@given(rows=events, cut1=st.integers(0, 40), cut2=st.integers(0, 40))
def test_keep_latest_merge_is_batch_split_invariant(rows, cut1, cut2):
    """The heart of stream_upsert_materialize's correctness claim: the
    keep-latest-per-key merge is associative and commutative, so folding
    ANY 3-way split of the events equals the batch latest-per-key answer
    (pure-Python model of the same (ts, event_id) lexicographic rule —
    ties included, since ts collisions are generated on purpose)."""
    lo, hi = sorted((min(cut1, len(rows)), min(cut2, len(rows))))
    batches = [rows[:lo], rows[lo:hi], rows[hi:]]

    def merge(state, batch):
        for u, e, ts, v in batch:
            cur = state.get(u)
            if cur is None or (ts, e) > (cur[0], cur[1]):
                state[u] = (ts, e, v)
        return state

    incremental = {}
    for b in batches:
        incremental = merge(incremental, b)
    oneshot = merge({}, rows)
    assert incremental == oneshot
