"""Bucketed-table co-located join: writing both sides bucketed on the
join key lets Spark plan a SortMergeJoin with ZERO exchanges — the
pre-shuffle layout that makes repeated big-big joins affordable at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from youtube_trending_data_pipeline_spark.plans.explain import physical_plan


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    (
        orders.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        customer.write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .saveAsTable("customer_b")
    )
    return spark.table("orders_b"), spark.table("customer_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders_b, customer_b = bucketed_tables
    # force SMJ so broadcast doesn't mask the bucketing effect
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders_b.join(
            customer_b, orders_b.o_custkey == customer_b.c_custkey
        ).groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
        joined.collect()
        plan = physical_plan(joined)
        # the join itself must consume bucketed scans directly: no shuffle
        # below the SortMergeJoin (the single exchange is the groupBy's)
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange" not in join_part, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_correct(spark, bucketed_tables):
    orders_b, customer_b = bucketed_tables
    got = (
        orders_b.join(customer_b, orders_b.o_custkey == customer_b.c_custkey)
        .count()
    )
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    expected = orders.join(customer, orders.o_custkey == customer.c_custkey).count()
    assert got == expected


def test_bucketed_pagerank_round_edge_side_shuffle_free(spark):
    """The 100 TB claim recorded in operators/graph.py: bucket the edge
    list by src and one PageRank round's rank-onto-edges join reads the
    edge side with NO exchange — only the (small) rank vector shuffles.
    This is the layout that amortizes across all iterations."""
    from youtube_trending_data_pipeline_spark.catalog import t

    li = t(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = t(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("l_suppkey").alias("s"),
            (F.col("o_custkey") + 1000000).alias("c"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
        .union(pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")))
        .distinct()
    )
    spark.sql("DROP TABLE IF EXISTS edges_b")
    (
        edges.write.bucketBy(8, "src")
        .sortBy("src")
        .mode("overwrite")
        .saveAsTable("edges_b")
    )
    edges_b = spark.table("edges_b")
    ranks = edges_b.select(F.col("src").alias("node")).distinct().select(
        "node", F.lit(1_000_000_000_000).alias("rank")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        contrib = (
            edges_b.join(ranks, edges_b["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum("rank").alias("s"))
        )
        contrib.collect()
        plan = physical_plan(contrib)
        assert "SortMergeJoin" in plan, plan
        # the streamed (edge) side of the SMJ must scan the bucketed
        # table directly: between the join and the edges_b FileScan there
        # is no Exchange node
        join_tail = plan.split("SortMergeJoin")[-1]
        edge_scan = join_tail.find("edges_b")
        assert edge_scan != -1, plan
        assert "Exchange" not in join_tail[:edge_scan], plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS edges_b")


def test_bucketed_hits_round_edge_side_shuffle_free(spark):
    """VERDICT r5 #6 — the HITS companion to the PageRank proof above:
    with TWO bucketed copies of the edge list (by src and by dst), BOTH
    half-steps of a HITS round read their edge side with NO exchange —
    the authority half-step (edges⋈hubs on src) consumes the
    src-bucketed copy, the hub half-step (edges⋈auths on dst) the
    dst-bucketed copy. Only the small score vectors shuffle, and the
    two layouts amortize across all iterations x 2 joins — the 100 TB
    claim in operators/graph.py:hits_integer."""
    from youtube_trending_data_pipeline_spark.catalog import t

    li = t(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = t(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey"
    )
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("l_suppkey").alias("src"),
            (F.col("o_custkey") + 1000000).alias("dst"),
        )
        .distinct()
    )
    for name, key in (("hits_edges_src", "src"), ("hits_edges_dst", "dst")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            edges.write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )
    e_src = spark.table("hits_edges_src")
    e_dst = spark.table("hits_edges_dst")
    hubs = e_src.select(F.col("src").alias("node")).distinct().select(
        "node", F.lit(1_000_000).alias("score")
    )
    auths = e_dst.select(F.col("dst").alias("node")).distinct().select(
        "node", F.lit(1_000_000).alias("score")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        half_steps = [
            (  # authority half-step: sum hub scores over in-edges
                e_src.join(hubs, e_src["src"] == hubs["node"])
                .groupBy("dst")
                .agg(F.sum("score").alias("raw")),
                "hits_edges_src",
            ),
            (  # hub half-step: sum authority scores over out-edges
                e_dst.join(auths, e_dst["dst"] == auths["node"])
                .groupBy("src")
                .agg(F.sum("score").alias("raw")),
                "hits_edges_dst",
            ),
        ]
        for step, table in half_steps:
            step.collect()
            plan = physical_plan(step)
            assert "SortMergeJoin" in plan, plan
            join_tail = plan.split("SortMergeJoin")[-1]
            edge_scan = join_tail.find(table)
            assert edge_scan != -1, plan
            assert "Exchange" not in join_tail[:edge_scan], plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS hits_edges_src")
        spark.sql("DROP TABLE IF EXISTS hits_edges_dst")


def test_bucketed_kcore_round_edge_side_shuffle_free(spark):
    """The k-core companion to the PageRank/HITS proofs: under a
    src-bucketed symmetric edge table, BOTH operations a peel round
    performs on the edge side — the degree aggregate (groupBy src) and
    the survivor semi-join (on src) — read the edges with NO exchange.
    Only the survivor vector (node list) shuffles, and the layout
    amortizes across all rounds — the 100 TB claim in
    operators/graph.py:kcore_peel."""
    from youtube_trending_data_pipeline_spark.catalog import t
    from youtube_trending_data_pipeline_spark.plans.explain import physical_plan

    li = t(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = t(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("l_suppkey").alias("s"),
            (F.col("o_custkey") + 1000000).alias("c"),
        )
        .distinct()
    )
    edges = pairs.selectExpr("s AS src", "c AS dst").union(
        pairs.selectExpr("c AS src", "s AS dst")
    )
    spark.sql("DROP TABLE IF EXISTS kcore_edges_src")
    (
        edges.write.bucketBy(8, "src")
        .sortBy("src")
        .mode("overwrite")
        .saveAsTable("kcore_edges_src")
    )
    e = spark.table("kcore_edges_src")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # degree aggregate: partial agg feeds the final agg with no
        # exchange ahead of the bucketed scan
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        deg.collect()
        plan = physical_plan(deg)
        scan = plan.find("kcore_edges_src")
        assert scan != -1, plan
        assert "Exchange" not in plan[:scan], plan
        # survivor semi-join on src: edge side exchange-free
        surv = deg.where(F.col("d") >= 3).select(
            F.col("src").alias("node")
        )
        step = e.join(surv, e["src"] == surv["node"], "left_semi")
        step.collect()
        plan = physical_plan(step)
        assert "SortMergeJoin" in plan, plan
        join_tail = plan.split("SortMergeJoin")[-1]
        edge_scan = join_tail.find("kcore_edges_src")
        assert edge_scan != -1, plan
        assert "Exchange" not in join_tail[:edge_scan], plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS kcore_edges_src")
