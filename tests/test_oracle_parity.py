"""Mimics the driver's correctness gate: run every catalog query through
Spark AND its DuckDB oracle on the same parquet, compare row count, column
names, per-column pandas dtypes (numeric/bool kinds), and an
order-insensitive multiset of type-tagged normalized row values.

Both sides are converted to PANDAS frames first — exactly like the driver —
because that conversion is itself a source of mismatches the old
fetchall()-based comparison could never see:
  * DuckDB windowed SUM(BIGINT) / list_sum(BIGINT[]) returns HUGEINT,
    which ``.df()`` renders as float64 — so an int-typed Spark column
    hash-mismatches even with identical values (the pack_sequences_linear
    incident, CORRECTNESS_r02/r03, and the sample_kcenter_coreset /
    maintenance_compaction_plan incidents, CORRECTNESS_r09).
  * list-typed cells are unhashable in the driver's pandas sort/hash step
    (the multimodal_image_features incident).

The comparison itself lives in ``youtube_trending_data_pipeline_spark.
parity`` and is shared with ``sweep.py``, so a full-catalog sweep and this
suite can never disagree about what EXACT means (VERDICT r9 item 2).

Run with SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full gate;
defaults to sf0.001 for speed in the inner loop.
"""

from __future__ import annotations

import duckdb
import pytest

from youtube_trending_data_pipeline_spark.catalog import QUERIES, _load_extensions
from youtube_trending_data_pipeline_spark.parity import compare_frames

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
    problems = compare_frames(spdf, dpdf)
    assert not problems, f"{name}: " + "; ".join(problems)
