"""AQE runtime filters: Spark can inject a bloom filter built from the
small (creation) side of a shuffle join into the scan of the big
(application) side — the runtime analogue of static predicate pushdown,
and the mechanism that prunes most of a 100 TB fact scan when the dim
filter is selective.  Local datasets sit far under the production-tuned
size thresholds, so the test lowers them to make injection observable;
the assertion is about plan shape, not tuning."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bloom_filter_injected_on_shuffle_join(spark, sf_dir):
    conf = spark.conf
    old = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle join
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
        )

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
            F.col("o_orderpriority") == "1-URGENT"  # selective creation side
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "bloom" in plan.lower(), plan[:4000]

        # and the filtered result is still correct
        [row] = joined.collect()
        expected = (
            li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
            .count()
        )
        assert row["n"] == expected
    finally:
        for k, v in old.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """DPP: a date-partitioned fact joined to a filtered dim must show a
    dynamicpruning subquery on the fact's partition column — at 100 TB
    this is the difference between scanning one partition and all of
    them when the filter arrives through a join."""
    import datetime as dt

    from pyspark.sql import functions as F

    fact = spark.createDataFrame(
        [(i, dt.date(2025, 10, 1 + i % 10)) for i in range(2000)],
        "id long, date date",
    )
    fact_path = str(tmp_path / "fact")
    fact.write.partitionBy("date").parquet(fact_path)
    dim = spark.createDataFrame(
        [(dt.date(2025, 10, 1 + i), "keep" if i == 3 else "drop") for i in range(10)],
        "date date, flag string",
    )
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    # defeat the reuse-broadcast shortcut check by forcing SMJ? no — DPP
    # with broadcast reuse is the common production shape; assert either
    # pruning expression form appears
    joined = (
        spark.read.parquet(fact_path)
        .join(dim.where(F.col("flag") == "keep"), "date")
        .groupBy("date")
        .count()
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() or "DynamicPruning" in plan, plan[:3000]
    out = joined.collect()
    assert len(out) == 1 and out[0]["count"] == 200
