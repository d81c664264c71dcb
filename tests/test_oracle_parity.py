"""Mimics the driver's correctness gate: run every catalog query through
Spark AND its DuckDB oracle on the same parquet, compare row count, column
names, and an order-insensitive multiset of normalized row values.

Both sides are converted to PANDAS frames first — exactly like the driver —
because that conversion is itself a source of mismatches the old
fetchall()-based comparison could never see:
  * DuckDB windowed SUM(BIGINT) returns HUGEINT, which ``.df()`` renders as
    float64 — so an int-typed Spark column hash-mismatches (the
    pack_sequences_linear incident, CORRECTNESS_r02/r03).
  * list-typed cells are unhashable in the driver's pandas sort/hash step
    (the multimodal_image_features incident).

Run with SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full gate;
defaults to sf0.001 for speed in the inner loop.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from youtube_trending_data_pipeline_spark.catalog import QUERIES, _load_extensions

_load_extensions()

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    import numpy as np
    import pandas as pd

    # the driver canonicalizes PANDAS frames, where a container-typed cell
    # is unhashable and crashes its sort — ban them here too. NB: Spark
    # toPandas() and DuckDB .df() both deliver array columns as
    # numpy.ndarray, NOT list — the r4 a23_collect_set/inverted_index reds
    # slipped through the old list-only check exactly that way.
    assert not isinstance(v, (list, dict, set, tuple, np.ndarray)), (
        f"unhashable container value {type(v).__name__} in oracle-checked "
        "output; flatten arrays/maps to scalar columns"
    )
    try:
        if v is None or pd.isna(v):
            # float NaN stays distinguishable from missing-object None the
            # same way on both sides (NULL numeric -> NaN in both pandas
            # conversions), so one token is enough
            return "NaN" if isinstance(v, float) else None
    except (TypeError, ValueError):
        pass
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact, NOT coerced to int: the driver's pandas value-hash
        # distinguishes int64 from float64 (HUGEINT incident)
        return float(v)
    if isinstance(v, int):
        return int(v)
    s = str(v)
    # date vs midnight-timestamp rendering differs between the two pandas
    # conversions; strip the zero time-of-day on both sides
    if s.endswith(" 00:00:00"):
        s = s[: -len(" 00:00:00")]
    return s


def _rows_multiset(pdf):
    from collections import Counter

    cols = sorted(pdf.columns)
    # per-column .tolist() converts numpy scalars to Python int/float while
    # keeping object cells (str/date/Decimal) intact
    col_vals = [pdf[c].tolist() for c in cols]
    return Counter(
        tuple(_norm(col[i]) for col in col_vals)
        for i in range(len(pdf))
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    oracle = spec.oracle(sf_dir) if callable(spec.oracle) else spec.oracle
    if oracle is None:
        # rows-only check: the driver records only the row count for
        # oracle-less queries, so locally require the query to actually
        # produce rows — a silent empty result (the sub_not_exists
        # incident) must fail here, not pass vacuously (ADVICE r1)
        assert sdf.count() > 0, f"{name}: rows-only query returned 0 rows"
        return
    spdf = sdf.toPandas()
    dpdf = duck.execute(oracle).df()
    assert sorted(spdf.columns) == sorted(dpdf.columns), (
        f"{name}: column names differ: {sorted(spdf.columns)} vs "
        f"{sorted(dpdf.columns)}"
    )
    assert len(spdf) == len(dpdf), (
        f"{name}: row count {len(spdf)} != {len(dpdf)}"
    )
    sm = _rows_multiset(spdf)
    dm = _rows_multiset(dpdf)
    if sm != dm:
        only_spark = list((sm - dm).elements())[:3]
        only_duck = list((dm - sm).elements())[:3]
        raise AssertionError(
            f"{name}: multiset mismatch; spark-only={only_spark} "
            f"duck-only={only_duck}"
        )
