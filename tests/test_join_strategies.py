"""Join-strategy control: hints must steer the planner — the knobs an
operator at 100 TB needs when the default strategy is wrong."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_trending_data_pipeline_spark.plans.explain import physical_plan


def test_join_hints_steer_strategy(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    cond = orders.o_custkey == customer.c_custkey

    broadcast = orders.join(F.broadcast(customer), cond)
    assert "BroadcastHashJoin" in physical_plan(broadcast)

    shj = orders.join(customer.hint("shuffle_hash"), cond)
    assert "ShuffledHashJoin" in physical_plan(shj)

    smj = orders.join(customer.hint("merge"), cond)
    assert "SortMergeJoin" in physical_plan(smj)


def test_sorted_write_clusters_rows(spark, tmp_path):
    import datetime as dt

    from youtube_trending_data_pipeline_spark.sources.tables import (
        overwrite_date_partition,
    )

    df = spark.createDataFrame(
        [(i * 37 % 1000, dt.date(2025, 1, 1)) for i in range(1000)],
        "k long, date date",
    ).repartition(1)
    path = str(tmp_path / "t")
    overwrite_date_partition(df, path, sort_cols=["k"])
    back = spark.read.parquet(path)
    vals = [r["k"] for r in back.collect()]
    assert vals == sorted(vals)  # row-group clustering materialized
