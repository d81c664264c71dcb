"""Edge-case tests for as-of join, sessionization, salted aggregation,
and the weekly-report HTML renderer."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from youtube_trending_data_pipeline_spark.operators.asof import as_of_join
from youtube_trending_data_pipeline_spark.operators.sessions import (
    session_stats,
    sessionize,
)
from youtube_trending_data_pipeline_spark.operators.skew import salted_sum


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("u1", 10, "p1"), ("u1", 20, "p2"), ("u2", 5, "p3"), ("u3", 9, "p4")],
        "user string, ts long, pid string",
    )
    right = spark.createDataFrame(
        [("u1", 10, "c1"), ("u1", 15, "c2"), ("u2", 6, "c3")],
        "user string, ts long, cid string",
    )
    out = as_of_join(left, right, ["user"], "ts", "ts", ["cid"])
    rows = {r["pid"]: r["asof_cid"] for r in out.collect()}
    assert rows == {
        "p1": "c1",  # equal ts matches (<=)
        "p2": "c2",  # latest prior
        "p3": None,  # right is after left -> no match
        "p4": None,  # no right rows for u3
    }
    assert out.count() == 4  # every left row survives


def test_asof_join_rejects_reserved_rts_payload(spark):
    """ADVICE r6: '_rts' is the internal matched-timestamp field of the
    carried payload struct — a payload column of that name would create
    duplicate struct fields and silently resolve wrong, so it is
    rejected loudly."""
    import pytest as _pytest

    left = spark.createDataFrame([("u1", 10)], "user string, ts long")
    right = spark.createDataFrame(
        [("u1", 5, 99)], "user string, ts long, _rts long"
    )
    with _pytest.raises(ValueError, match="_rts"):
        as_of_join(left, right, ["user"], "ts", "ts", ["_rts"])


def test_sessionize_gaps(spark):
    ev = spark.createDataFrame(
        [("u", 0, 1), ("u", 100, 2), ("u", 5000, 3), ("u", 5100, 4), ("v", 0, 5)],
        "user string, ts long, eid long",
    )
    out = sessionize(ev, "user", "ts", gap=1000, order_tiebreak="eid")
    got = {r["eid"]: r["session_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}
    stats = session_stats(ev, "user", "ts", gap=1000)
    s = {(r["user"], r["session_id"]): (r["n_events"], r["duration"]) for r in stats.collect()}
    assert s[("u", 1)] == (2, 100)
    assert s[("u", 2)] == (2, 100)
    assert s[("v", 1)] == (1, 0)


def test_salted_sum_equals_plain_groupby(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from youtube_trending_data_pipeline_spark.catalog import cents

    pre = ev.select("event_id", "event_type", cents("value").alias("v100"))
    salted = salted_sum(pre, ["event_type"], "v100", "event_id", out_col="total")
    plain = pre.groupBy("event_type").agg(F.sum("v100").alias("total"))
    a = {(r["event_type"], r["total"]) for r in salted.collect()}
    b = {(r["event_type"], r["total"]) for r in plain.collect()}
    assert a == b


def test_approx_percentile_within_rank_error(spark):
    """percentile_approx must land within the documented rank-error bound
    of the exact percentile: with accuracy A, the returned value's rank
    differs from the target rank by at most n/A."""
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    accuracy = 1000
    n = li.count()
    vals = sorted(r["l_extendedprice"] for r in li.select("l_extendedprice").collect())
    for p in (0.5, 0.95):
        approx = li.agg(
            F.percentile_approx("l_extendedprice", p, accuracy).alias("a")
        ).collect()[0]["a"]
        import bisect

        rank = bisect.bisect_left(vals, approx)
        target = p * n
        assert abs(rank - target) <= n / accuracy + 1, (
            p,
            approx,
            rank,
            target,
        )


def test_approx_distinct_close_to_exact(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    approx = {
        r["l_returnflag"]: r["a"]
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey").alias("a"))
        .collect()
    }
    exact = {
        r["l_returnflag"]: r["e"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("e"))
        .collect()
    }
    for k in exact:
        assert abs(approx[k] - exact[k]) / exact[k] < 0.1


def test_zscore_jvm_equals_pandas(spark):
    from youtube_trending_data_pipeline_spark.operators.grouped import (
        zscore_jvm,
        zscore_pandas,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "label", F.element_at("embedding", 1).cast("double").alias("v")
    )
    jvm = {
        (r["label"], r["v"]): r["zscore"]
        for r in zscore_jvm(emb, "label", "v").collect()
    }
    pnd = {
        (r["label"], r["v"]): r["zscore"]
        for r in zscore_pandas(emb, "label", "v").collect()
    }
    assert set(jvm) == set(pnd)
    for k in jvm:
        assert abs(jvm[k] - pnd[k]) < 1e-9


def test_stratified_sample_deterministic(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fr = {"en": 0.5, "es": 1.0, "de": 1.0, "fr": 1.0, "zh": 0.25}
    a = docs.sampleBy("lang", fr, seed=42).count()
    b = docs.sampleBy("lang", fr, seed=42).count()
    assert a == b > 0


def test_funnel_ordering_semantics(spark):
    from youtube_trending_data_pipeline_spark.operators.funnel import funnel_summary

    # u1 completes the funnel in order; u2 has click BEFORE view (must not
    # count past step 1); u3 only views
    ev = spark.createDataFrame(
        [
            (1, "u1", 10, "view"), (2, "u1", 20, "click"), (3, "u1", 30, "purchase"),
            (4, "u2", 15, "click"), (5, "u2", 25, "view"),
            (6, "u3", 5, "view"),
        ],
        "event_id long, user string, ts long, event_type string",
    )
    steps = [
        ("view", F.col("event_type") == "view"),
        ("click", F.col("event_type") == "click"),
        ("purchase", F.col("event_type") == "purchase"),
    ]
    got = {r["step"]: r["n_users"] for r in funnel_summary(ev, "user", "ts", steps).collect()}
    assert got == {"view": 3, "click": 1, "purchase": 1}


def test_weekly_html_renderer(spark):
    from youtube_trending_data_pipeline_spark.report.html import render_weekly_html

    report = spark.createDataFrame(
        [("QA", 10, "1,234", "567", 8.9)],
        "region string, top_category long, total_views_for_top_category string, "
        "total_likes_for_top_category string, average_engagement_ratio double",
    )
    html_out = render_weekly_html(report)
    assert "<table" in html_out and "QA" in html_out and "1,234" in html_out
    # escaping: no raw script injection from values
    evil = spark.createDataFrame([("<script>", 1, "2", "3", 4.0)], report.schema)
    assert "<script>" not in render_weekly_html(evil).replace("&lt;script&gt;", "")


def test_connected_components_chain_and_islands(spark):
    from youtube_trending_data_pipeline_spark.operators.components import (
        connected_components,
        duplicate_clusters,
    )

    # A 6-node chain (diameter 5 — forces multiple propagation rounds),
    # plus a separate triangle and an edge pair: 3 components total.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
         (10, 11), (11, 12), (12, 10),
         (20, 21)],
        "src long, dst long",
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert {got[n] for n in (1, 2, 3, 4, 5, 6)} == {1}
    assert {got[n] for n in (10, 11, 12)} == {10}
    assert {got[n] for n in (20, 21)} == {20}

    clusters = {
        r["component"]: (r["n_members"], r["members"])
        for r in duplicate_clusters(edges, "src", "dst").collect()
    }
    assert clusters[1] == (6, [1, 2, 3, 4, 5, 6])
    assert clusters[10] == (3, [10, 11, 12])
    assert clusters[20] == (2, [20, 21])


def test_pca_project_invariants(spark):
    """embedding_pca_project has no SQL oracle, so pin its math here:
    deterministic across reruns, pc1 captures at least as much energy as
    pc2, and the projection magnitudes are bounded by the vector norms
    (Cauchy-Schwarz with unit axes)."""
    import math

    from youtube_trending_data_pipeline_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out1 = {r["vec_id"]: (r["pc1"], r["pc2"]) for r in sim.pca_project(emb).collect()}
    out2 = {r["vec_id"]: (r["pc1"], r["pc2"]) for r in sim.pca_project(emb).collect()}
    assert out1 == out2, "projection must be deterministic"
    e1 = sum(v[0] * v[0] for v in out1.values())
    e2 = sum(v[1] * v[1] for v in out1.values())
    assert e1 >= e2, "pc1 must carry at least as much energy as pc2"
    norms = {
        r["vec_id"]: math.sqrt(
            sum(float(x) ** 2 for x in r["embedding"])
        )
        for r in emb.collect()
    }
    for vid, (p1, p2) in out1.items():
        bound = norms[vid] + 1e-6
        assert abs(p1) <= bound and abs(p2) <= bound
