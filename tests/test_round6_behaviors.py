"""Behavioral claims of the round-6 batch-3 operators — the semantics
the oracle sweep can't state: leakage-freedom, censoring flags,
asymmetric containment, deterministic arms, Pareto closure."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from youtube_trending_data_pipeline_spark.catalog import QUERIES, _load_extensions

_load_extensions()

SF = "/root/testdata/sf0.001"


def _events_dir(spark, rows):
    d = tempfile.mkdtemp(prefix="r6beh-")
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, event_type string, "
        "value double, props string"
    ).selectExpr(
        "event_id", "timestamp_micros(ts_us) AS ts", "user_id",
        "event_type", "value", "props",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_attribution_credits_last_click_and_organic(spark):
    """Revenue lands on the most recent PRIOR click's channel; purchases
    with no prior click go to organic (-1); later clicks don't count."""
    rows = [
        # user 1: click ch(k=7 -> 7%5=2) at t=100, purchase at t=200
        (1, 1, 100, "click", 0.0, '{"k": 7}'),
        (2, 1, 200, "purchase", 10.0, "{}"),
        # user 2: purchase at t=50 BEFORE its only click at t=60 -> organic
        (3, 2, 50, "purchase", 5.0, "{}"),
        (4, 2, 60, "click", 0.0, '{"k": 3}'),
    ]
    d = _events_dir(spark, rows)
    got = {
        r.channel: (r.n_purchases, r.revenue_c)
        for r in QUERIES["attribution_last_touch"].fn(spark, d).collect()
    }
    assert got[2] == (1, 1000)   # user 1's $10 on channel 2
    assert got[-1] == (1, 500)   # user 2 organic


def test_target_encoding_excludes_own_label(spark):
    """LOO property: a row's own target never leaks into its feature —
    in a segment where only row X has target 1, X's encoding is 0 and
    every other row's encoding is positive."""
    # user_id % 10 buckets; value > $50 is the target
    rows = [
        (i, 10 + 0, i * 100, "view", 10.0, "{}") for i in range(4)
    ] + [(99, 10, 9900, "view", 100.0, "{}")]  # the single target=1 row
    d = _events_dir(spark, rows)
    got = {
        r.event_id: r.te_loo_ppm
        for r in QUERIES["feature_target_encode_loo"].fn(spark, d).collect()
    }
    assert got[99] == 0  # own label excluded -> rate over others = 0
    for i in range(4):
        assert got[i] == 250000  # 1 positive among the other 4 rows


def test_next_event_labels_censor_final_event(spark):
    rows = [
        (1, 1, 100, "view", 0.0, "{}"),
        (2, 1, 250, "click", 0.0, "{}"),
        (3, 1, 400, "purchase", 1.0, "{}"),
    ]
    d = _events_dir(spark, rows)
    got = {
        r.event_id: (r.next_event_type, r.gap_us)
        for r in QUERIES["labels_next_event"].fn(spark, d).collect()
    }
    assert got[1] == ("click", 150)
    assert got[2] == ("purchase", 150)
    assert got[3] == (None, None)  # right-censored final event


def test_ab_arms_deterministic_and_user_level(spark):
    """Arms are a pure function of user_id (rerun-stable), and a heavy
    user converts once, not per purchase."""
    rows = [
        (1, 7, 100, "purchase", 10.0, "{}"),
        (2, 7, 200, "purchase", 20.0, "{}"),  # same user converts ONCE
        (3, 8, 100, "view", 0.0, "{}"),
    ]
    d = _events_dir(spark, rows)
    out1 = {r.arm: (r.n_users, r.n_converted, r.revenue_c)
            for r in QUERIES["ab_test_metrics"].fn(spark, d).collect()}
    out2 = {r.arm: (r.n_users, r.n_converted, r.revenue_c)
            for r in QUERIES["ab_test_metrics"].fn(spark, d).collect()}
    assert out1 == out2
    assert sum(v[0] for v in out1.values()) == 2       # two users
    assert sum(v[1] for v in out1.values()) == 1       # one converted user
    assert sum(v[2] for v in out1.values()) == 3000    # $30 total


def test_pareto_cumulative_closes_at_one(spark):
    rows = QUERIES["w_pareto_concentration"].fn(spark, SF).collect()
    assert rows
    by_decile = {r.decile: r for r in rows}
    last = max(by_decile)
    assert by_decile[last].cum_share_ppm == 1_000_000
    # cumulative share is monotone over deciles
    shares = [by_decile[d].cum_share_ppm for d in sorted(by_decile)]
    assert shares == sorted(shares)


def test_containment_flags_subset_document(spark):
    """A document fully contained in a larger one must score containment
    1e6 on the small side even though Jaccard is far below any near-dup
    threshold."""
    small = "alpha beta gamma delta epsilon"
    big = small + " " + " ".join(f"w{i}" for i in range(40))
    d = tempfile.mkdtemp(prefix="cont-")
    spark.createDataFrame(
        [(1, small), (2, big)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {
        (r.id_a, r.id_b): (r.containment_a_ppm, r.containment_b_ppm)
        for r in QUERIES["dedup_shingle_containment"].fn(spark, d).collect()
    }
    a, b = got[(1, 2)]
    assert a == 1_000_000 and b < 200_000


def test_containment_posting_guard_fires(spark):
    """Round 12: the exact containment entry must fail LOUDLY when a
    shingle posting list exceeds max_posting_len (d docs emit d^2/2
    join rows — the 100x replica measured 23.8e9 rows uncapped), not
    silently burn hours; production is dedup_containment_capped."""
    import pytest

    from youtube_trending_data_pipeline_spark.catalog_curation import (
        dedup_shingle_containment,
    )

    d = tempfile.mkdtemp(prefix="cont-guard-")
    shared = "alpha beta gamma delta"
    spark.createDataFrame(
        [(i, f"{shared} unique{i} tail{i}") for i in range(5)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    with pytest.raises(Exception, match="max_posting_len"):
        dedup_shingle_containment(spark, d, max_posting_len=2).collect()
    # and silent when under the bound
    assert dedup_shingle_containment(spark, d, max_posting_len=10).count() >= 0


def test_containment_capped_matches_exact_at_gate_scale(spark):
    """Round 12: the DF-capped production form (candidates from rare
    shingles only, exact rescore on full shingle sets) must reproduce
    the uncapped entry's flagged pairs AND scores at gate scale — the
    cap only prunes candidate GENERATION, never scoring."""
    def rows(name):
        return {
            (r.id_a, r.id_b): (r.containment_a_ppm, r.containment_b_ppm)
            for r in QUERIES[name].fn(spark, SF).collect()
        }

    assert rows("dedup_containment_capped") == rows("dedup_shingle_containment")


def test_containment_df_cap_schedule():
    """Corpus-relative DF cap: floor 16 at gate corpora, ceiling 128."""
    from youtube_trending_data_pipeline_spark.catalog_curation import (
        containment_df_cap,
    )

    assert containment_df_cap(500) == 16
    assert containment_df_cap(3000) == 100
    assert containment_df_cap(500_000) == 128


def test_walk_forward_train_grows_and_roles_disjoint(spark):
    rows = QUERIES["split_walk_forward"].fn(spark, SF).collect()
    by = {(r.fold, r.role): r for r in rows}
    trains = [by[(f, "train")].n_events for f in sorted({r.fold for r in rows})]
    assert trains == sorted(trains)  # training window only grows
    for f in sorted({r.fold for r in rows}):
        tr, te = by.get((f, "train")), by.get((f, "test"))
        if tr and te:
            assert tr.max_day < te.min_day  # temporal order, no leakage


def test_bfs_distances_on_crafted_path(spark):
    """Multi-source BFS on a 5-node path: seed supplier 0 (suppkey%100==0)
    reaches customer A at 1 hop, supplier 7 at 2, customer B at 3,
    supplier 13 at 4 — exact hop distances, nothing else reached deeper
    than the 4-round budget."""
    import tempfile

    d = tempfile.mkdtemp(prefix="bfs-")
    # path: s0 - cA(5) - s7 - cB(6) - s13 via orders (orderkey->cust)
    # joined to lineitem (orderkey->supp)
    orders = [(1, 5), (2, 5), (3, 6), (4, 6)]
    lineitem = [(1, 0), (2, 7), (3, 7), (4, 13)]
    spark.createDataFrame(
        [(o, c, "O", 1.0, None, "x") for o, c in orders],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(o, 1, s, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None)
         for o, s in lineitem],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    got = {
        r.node: r.dist
        for r in QUERIES["graph_bfs_distances"].fn(spark, d).collect()
    }
    assert got == {0: 0, 1000005: 1, 7: 2, 1000006: 3, 13: 4}


def test_v_shape_detects_local_minimum_only(spark):
    rows = [
        (1, 1, 100, "view", 5.0, "{}"),
        (2, 1, 200, "view", 2.0, "{}"),   # bottom of the V
        (3, 1, 300, "view", 4.0, "{}"),
        (4, 1, 400, "view", 6.0, "{}"),   # monotone rise: not a bottom
    ]
    d = _events_dir(spark, rows)
    got = {
        r.event_id: (r.bottom_cents, r.depth_cents)
        for r in QUERIES["w_pattern_v_shape"].fn(spark, d).collect()
    }
    assert got == {2: (200, 200)}  # depth = min(500-200, 400-200)


def test_asof_tolerance_nulls_stale_matches(spark):
    """j6c: a click 1h+1us before the purchase is dropped; 1h-1us
    survives (pandas merge_asof tolerance semantics)."""
    hour_us = 3_600_000_000
    rows = [
        (1, 1, 0, "click", 0.0, "{}"),
        (2, 1, hour_us - 1, "purchase", 1.0, "{}"),   # within tolerance
        (3, 2, 0, "click", 0.0, "{}"),
        (4, 2, hour_us + 1, "purchase", 1.0, "{}"),   # stale -> NULL
    ]
    d = _events_dir(spark, rows)
    got = {
        r.event_id: r.asof_click_event_id
        for r in QUERIES["j6c_asof_tolerance"].fn(spark, d).collect()
    }
    assert got[2] == 1 and got[4] is None


def test_personalized_pagerank_localizes_to_seed_component(spark):
    """PPR property uniform PageRank lacks: nodes unreachable from the
    seeds hold rank 0, and seeds outrank their neighbors."""
    from youtube_trending_data_pipeline_spark.operators.graph import (
        personalized_pagerank_integer,
    )

    edges = spark.createDataFrame(
        # component 1: 0 <-> 1 ; component 2: 10 <-> 11 (disconnected)
        [(0, 1), (1, 0), (10, 11), (11, 10)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        r.node: r.rank
        for r in personalized_pagerank_integer(
            edges, seeds, iterations=4
        ).collect()
    }
    assert got[10] == 0 and got[11] == 0     # walk never reaches them
    assert got[0] > got[1] > 0               # seed holds restart mass


def test_personalized_pagerank_big_suppkey_is_seed(spark):
    """r12 100x regression: a seed supplier whose key exceeds the OLD
    custkey + 1e6 node offset must still receive restart mass — the
    retired encoding collided its node id with the customer space and
    the retired oracle guard (node < 1e6) dropped it from the seed
    set, diverging from the Spark side at replica scale. Parity
    encoding (2s / 2c+1) keeps the spaces disjoint at any key range."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="pprbig-")
    # supplier 1_000_100 (% 100 == 0, > 1e6) serves customer 5;
    # supplier 7 (not a seed) serves customer 9
    pq.write_table(
        pa.table({"l_orderkey": [1, 2], "l_suppkey": [1_000_100, 7],
                  "l_linenumber": [1, 1]}),
        f"{d}/lineitem.parquet",
    )
    pq.write_table(
        pa.table({"o_orderkey": [1, 2], "o_custkey": [5, 9]}),
        f"{d}/orders.parquet",
    )
    got = {
        r["node"]: r["rank"]
        for r in QUERIES["graph_personalized_pagerank"].fn(spark, d).collect()
    }
    seed_node, cust_node = 2 * 1_000_100, 2 * 5 + 1
    other_supp, other_cust = 2 * 7, 2 * 9 + 1
    assert got[seed_node] > got[cust_node] > 0   # seed holds restart mass
    assert got[other_supp] == 0 and got[other_cust] == 0  # unreachable
    # parity invariant: supplier nodes even, customer nodes odd
    assert all(n % 2 == 0 for n in (seed_node, other_supp))
    assert all(n % 2 == 1 for n in (cust_node, other_cust))


def test_bmp_encoder_roundtrip_and_quarantine(spark):
    """encode_bmp is the exact inverse of decode_bmp for arbitrary
    rasters (including odd widths that need row padding), and corrupt
    input quarantines."""
    from youtube_trending_data_pipeline_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
        transcode_ppm_to_bmp,
    )

    rgb = bytes(range(3 * 3 * 3))  # 3x3, odd width -> padded rows
    assert decode_bmp(encode_bmp(3, 3, rgb)) == (3, 3, rgb)

    media = spark.createDataFrame(
        [("ok", "image", b"P6\n2 2\n255\n" + bytes(range(12))),
         ("bad", "image", b"garbage")],
        "asset_id string, media_type string, content binary",
    )
    got = {r.asset_id: r for r in transcode_ppm_to_bmp(media).collect()}
    assert got["ok"].pixels_equal is True
    assert got["bad"].pixels_equal is None and got["bad"].out_bytes is None
