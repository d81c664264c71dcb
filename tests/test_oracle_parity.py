"""Mimics the driver's correctness gate: run every catalog query through
Spark AND its DuckDB oracle on the same parquet, compare row count, column
names, and an order-insensitive multiset of normalized row values.

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
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact: catalog queries are written to be bit-identical across
        # engines (integer-cents aggregation; see catalog.cents)
        return v
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    return str(v)


def _rows_multiset(cols, rows):
    from collections import Counter

    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in idx) for r in rows)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    if spec.oracle is None:
        # rows-only check: the driver records only the row count for
        # oracle-less queries, so locally require the query to actually
        # produce rows — a silent empty result (the sub_not_exists
        # incident) must fail here, not pass vacuously (ADVICE r1)
        assert len(srows) > 0, f"{name}: rows-only query returned 0 rows"
        return
    ddf = duck.execute(spec.oracle).fetchall()
    dcols = [d[0] for d in duck.description]
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(ddf), f"{name}: row count {len(srows)} != {len(ddf)}"
    sm = _rows_multiset(scols, [[row[c] for c in scols] for row in srows])
    dm = _rows_multiset(dcols, ddf)
    if sm != dm:
        only_spark = list((sm - dm).elements())[:3]
        only_duck = list((dm - sm).elements())[:3]
        raise AssertionError(
            f"{name}: multiset mismatch; spark-only={only_spark} duck-only={only_duck}"
        )
