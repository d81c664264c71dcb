"""AQE skew-join handling must actually engage, not just be enabled.

The 100 TB skew story is two-layered: salting for aggregations
(operators/skew.py, tested in test_new_operators) and AQE's runtime
skew-join split for joins. This test builds a join where one key owns
most of the fact side and asserts the FINAL adaptive plan marks the
sort-merge join as skew-handled (``skew=true``) — proving the engine's
config actually rewrites the plan at runtime rather than relying on
documentation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_confs(spark):
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.shuffle.partitions",
    ]
    saved = {k: spark.conf.get(k, None) for k in keys}
    # force sort-merge (no broadcast) and make the skew detector fire at
    # test scale: compressed map-output partitions here are only tens of
    # KB, so the thresholds must sit below that (a partition is skewed
    # if > max(threshold, factor x median))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8192"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4096")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_confs):
    # 300k fact rows, ~70% on key 0, so one reduce partition dwarfs the
    # others and exceeds the lowered skew threshold
    fact = spark.range(300_000).select(
        F.when(F.col("id") % 10 < 7, 0)
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        # incompressible-ish payload so the hot partition's compressed
        # map-output size clearly dominates the others
        F.concat(
            F.md5(F.col("id").cast("string")),
            F.md5((F.col("id") + 1).cast("string")),
        ).alias("payload"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    # NOTE: no keyed aggregation downstream of the join — AQE skips the
    # skew split when the join's output partitioning feeds a required
    # hash distribution (splitting would break it); a global aggregate
    # has no such requirement. For keyed aggregation over skewed keys,
    # the engine's answer is salting (operators/skew.py).
    joined = fact.join(dim, "k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("k") == 0, 1).otherwise(0)).alias("hot"),
    )
    row = joined.collect()[0]
    assert row["n"] == 300_000  # every fact key exists in the dim
    assert row["hot"] == sum(1 for i in range(300_000) if i % 10 < 7)

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, f"AQE did not mark the join skew-handled:\n{plan[:2000]}"
