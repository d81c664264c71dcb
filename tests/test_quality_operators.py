"""Behavioral tests for catalog_quality.py entries (round 8) — crafted
corpora with hand-computable answers, the catalog-module doctrine."""

from __future__ import annotations

from youtube_trending_data_pipeline_spark.catalog import (
    QUERIES,
    _load_extensions,
)

_load_extensions()


def _write_events(spark, d, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")


def _write_docs(spark, d, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")


def test_auc_perfect_random_and_ties(spark, tmp_path):
    """Separable scores give AUC 1.0; one tied pos/neg pair costs half a
    win; hand-check 2 pos x 2 neg grids."""
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    d = str(tmp_path)
    # perfect separation: positives (purchase) score above all negatives
    rows = [
        (0, ts, 1, "purchase", 10.0, "{}"),
        (1, ts, 1, "purchase", 9.0, "{}"),
        (2, ts, 1, "click", 2.0, "{}"),
        (3, ts, 1, "click", 1.0, "{}"),
    ]
    _write_events(spark, d, rows)
    r = QUERIES["eval_auc_exact"].fn(spark, d).collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc_ppm"]) == (2, 2, 1_000_000)

    # one tie across classes: wins = 1*2 (pos 10 beats both) + 1 (pos 2.0
    # beats neg 1.0) + 0.5 (tie at 2.0) = 3.5 of 4 -> 875000 ppm
    rows[1] = (1, ts, 1, "purchase", 2.0, "{}")
    _write_events(spark, d, rows)
    r = QUERIES["eval_auc_exact"].fn(spark, d).collect()[0]
    assert r["auc_ppm"] == 875_000

    # reversed separation: AUC 0
    rows = [
        (0, ts, 1, "purchase", 1.0, "{}"),
        (1, ts, 1, "click", 2.0, "{}"),
    ]
    _write_events(spark, d, rows)
    r = QUERIES["eval_auc_exact"].fn(spark, d).collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc_ppm"]) == (1, 1, 0)


def test_t_closeness_identical_and_disjoint_groups(spark, tmp_path):
    """A group matching the global mix has EMD 0; a group concentrated on
    the lexically-first segment of two has EMD = its cum gap."""
    d = str(tmp_path)
    # two segments A, B; nation 0 = 1xA 1xB; nation 1 = 2xA -> global
    # mix 3A 1B, N=4, m=2.
    rows = [
        (0, "c0", 0, 0.0, "A"),
        (1, "c1", 0, 0.0, "B"),
        (2, "c2", 1, 0.0, "A"),
        (3, "c3", 1, 0.0, "A"),
    ]
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{d}/customer.parquet")
    out = {
        r["c_nationkey"]: r
        for r in QUERIES["privacy_t_closeness"].fn(spark, d).collect()
    }
    # nation 0: cum_g(A)=1, n_g=2; |1*4 - 3*2| = 2; ppm = 1e6*2 // (2*4*1)
    assert out[0]["n_g"] == 2 and out[0]["emd_ppm"] == 250_000
    # nation 1: cum_g(A)=2, n_g=2; |2*4 - 3*2| = 2; same gap
    assert out[1]["n_g"] == 2 and out[1]["emd_ppm"] == 250_000


def test_blocklist_hits_and_clean_docs(spark, tmp_path):
    """Only docs containing blocklist tokens appear; counts are
    token-exact (no substring matches)."""
    d = str(tmp_path)
    _write_docs(
        spark,
        d,
        [
            (0, "spark hash spark", "en", "s", 17),      # 3 hits, 2 terms
            (1, "sparkle hashing none", "en", "s", 20),  # substrings only
            (2, "sort merge sort window", "en", "s", 22),  # 4 hits, 3 terms
        ],
    )
    out = {
        r["doc_id"]: r
        for r in QUERIES["blocklist_term_audit"].fn(spark, d).collect()
    }
    assert set(out) == {0, 2}
    assert (out[0]["n_hits"], out[0]["n_terms"]) == (3, 2)
    assert (out[2]["n_hits"], out[2]["n_terms"]) == (4, 3)


def test_longest_repeated_ngram_planted(spark, tmp_path):
    """A doc with a repeated 4-token clause reports max_rep_n 4 (its
    nested repeated 2/3-grams don't win); a no-repeat doc is absent."""
    d = str(tmp_path)
    _write_docs(
        spark,
        d,
        [
            # "a b c d" repeats (positions 1 and 6); no 5-gram repeats
            (0, "a b c d x a b c d", "en", "s", 17),
            (1, "u v w x y z", "en", "s", 11),  # all tokens distinct
            # two distinct repeated 2-grams, nothing longer:
            # "p q" x2 and "r s" x2 (interleaved so no 3-gram repeats)
            (2, "p q r s z p q y r s", "en", "s", 19),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in
        QUERIES["text_longest_repeated_ngram"].fn(spark, d).collect()
    }
    assert set(out) == {0, 2}
    assert (out[0]["max_rep_n"], out[0]["reps_at_max"]) == (4, 1)
    assert (out[2]["max_rep_n"], out[2]["reps_at_max"]) == (2, 2)


def test_rouge_recall_hand_computed(spark, tmp_path):
    """ROUGE-1/2 recall against a hand-built pair: ref tokens counted
    with clipping at the candidate's counts, denominator on the ref."""
    d = str(tmp_path)
    _write_docs(
        spark,
        d,
        [
            # pair (ref 10, cand 11): ref = "a b c a", cand = "a b x"
            # R1: ref counts {a:2,b:1,c:1}; clipped at cand {a:1,b:1,x:1}
            #   -> ov = min(2,1)+min(1,1)+0 = 2 of 4 -> 500000
            # R2: ref bigrams {a b, b c, c a}; cand {a b, b x}
            #   -> ov = 1 of 3 -> 333333
            (10, "a b c a", "en", "s", 7),
            (11, "a b x", "en", "s", 5),
            # ref 12 has no candidate 13 -> absent from output
            (12, "z z", "en", "s", 3),
        ],
    )
    out = {
        r["pair_id"]: r for r in QUERIES["eval_rouge_n"].fn(spark, d).collect()
    }
    assert set(out) == {11}
    r = out[11]
    assert (r["n_ref_tokens"], r["r1_ppm"], r["r2_ppm"]) == (4, 500_000, 333_333)


def test_bootstrap_ci_constant_and_ordering(spark, tmp_path):
    """A constant-valued corpus bootstraps to a zero-width CI at the
    point estimate, whatever the weights drawn."""
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    d = str(tmp_path)
    _write_events(
        spark, d, [(i, ts, 1, "click", 7.5, "{}") for i in range(50)]
    )
    r = QUERIES["eval_bootstrap_ci"].fn(spark, d).collect()[0]
    assert (r["point_cents"], r["lo_cents"], r["hi_cents"]) == (750, 750, 750)

    # two-valued corpus: CI bounds must bracket the point estimate
    _write_events(
        spark,
        d,
        [(i, ts, 1, "click", 1.0 if i % 2 else 9.0, "{}") for i in range(200)],
    )
    r = QUERIES["eval_bootstrap_ci"].fn(spark, d).collect()[0]
    assert r["lo_cents"] <= r["point_cents"] <= r["hi_cents"]
    assert r["lo_cents"] < r["hi_cents"]


def test_margin_demotes_hub(spark, tmp_path):
    """A hub vector close to everything loses to a reciprocal pair
    under margin scoring: the pair's members pick each other, not the
    hub, because the hub's own neighborhood sum is high."""
    import math

    d = str(tmp_path)
    rows = []
    # two tight pairs on orthogonal axes + one hub mixing both axes
    def vec(axes):
        v = [0.0] * 64
        for a, x in axes:
            v[a] = x
        return v

    rows.append((0, vec([(0, 1.0)]), 0))        # pair A
    rows.append((1, vec([(0, 0.9), (5, 0.1)]), 0))
    rows.append((2, vec([(1, 1.0)]), 1))        # pair B
    rows.append((3, vec([(1, 0.9), (6, 0.1)]), 1))
    rows.append((4, vec([(0, 0.7), (1, 0.7)]), 2))  # hub
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    out = {r["u"]: r["v"] for r in QUERIES["sim_margin_topk"].fn(spark, d).collect()}
    # margin's winner for each pair member is its partner, not the hub
    assert out[0] == 1 and out[1] == 0
    assert out[2] == 3 and out[3] == 2


def test_chi2_independent_and_dependent(spark, tmp_path):
    """A perfectly balanced type x weekday table scores chi2 0; a fully
    type-determined weekday scores chi2 = N * (t-1) * 1000 milli
    (the maximum for t = w categories)."""
    import datetime

    d = str(tmp_path)
    base = datetime.datetime(2024, 1, 4)  # a Thursday -> wd 4 convention
    # independent: 2 types x 2 weekdays, every cell count 5
    rows = []
    eid = 0
    for ti, et in enumerate(["a", "b"]):
        for day in range(2):
            for _ in range(5):
                rows.append(
                    (eid, base + datetime.timedelta(days=day), 1, et, 1.0,
                     "{}")
                )
                eid += 1
    _write_events(spark, d, rows)
    r = QUERIES["dq_chi2_independence"].fn(spark, d).collect()[0]
    assert (r["n"], r["n_types"], r["n_weekdays"], r["dof"]) == (20, 2, 2, 1)
    assert r["chi2_milli"] == 0

    # dependent: type 'a' only day 0, type 'b' only day 1 -> chi2 = N
    rows = []
    eid = 0
    for et, day in [("a", 0), ("b", 1)]:
        for _ in range(10):
            rows.append(
                (eid, base + datetime.timedelta(days=day), 1, et, 1.0, "{}")
            )
            eid += 1
    _write_events(spark, d, rows)
    r = QUERIES["dq_chi2_independence"].fn(spark, d).collect()[0]
    assert r["chi2_milli"] == 20 * 1000  # chi2 == N for a 2x2 full split


def test_temperature_mix_flattens_shares(spark, tmp_path):
    """alpha = 1/2 mixing: a 100x larger source gets only 10x the
    weight; shares and quotas are exact integer floors."""
    d = str(tmp_path)
    rows = []
    did = 0
    for src, n in [("big", 400), ("small", 4)]:
        for _ in range(n):
            rows.append((did, "x y", "en", src, 3))
            did += 1
    _write_docs(spark, d, rows)
    out = {
        r["source"]: r
        for r in QUERIES["corpus_temperature_mix"].fn(spark, d).collect()
    }
    # weights: sqrt(400)=20, sqrt(4)=2 -> shares 20/22, 2/22
    assert out["big"]["w"] == 20 and out["small"]["w"] == 2
    assert out["big"]["share_ppm"] == 1_000_000 * 20 // 22
    assert out["small"]["share_ppm"] == 1_000_000 * 2 // 22
    assert out["small"]["quota_docs"] == 100_000 * 2 // 22
    # natural share of 'small' would be 4/404 ~ 9900 ppm; mixing lifts
    # it to ~90909 ppm — the flattening the operator exists for
    assert out["small"]["share_ppm"] > 9_900 * 5


def test_brier_ece_perfect_and_worst(spark, tmp_path):
    """Perfectly calibrated confident predictions score Brier 0 / ECE 0;
    maximally wrong confident predictions score both 1e6 ppm."""
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    d = str(tmp_path)
    # p = 1.0 (value 100) on purchases, p = 0.0 on non-purchases
    rows = [(i, ts, 1, "purchase", 100.0, "{}") for i in range(10)]
    rows += [(10 + i, ts, 1, "click", 0.0, "{}") for i in range(10)]
    _write_events(spark, d, rows)
    r = QUERIES["eval_brier_ece"].fn(spark, d).collect()[0]
    assert (r["n"], r["brier_ppm"], r["ece_ppm"]) == (20, 0, 0)

    # inverted: confident 1.0 on non-purchases, 0.0 on purchases
    rows = [(i, ts, 1, "click", 100.0, "{}") for i in range(10)]
    rows += [(10 + i, ts, 1, "purchase", 0.0, "{}") for i in range(10)]
    _write_events(spark, d, rows)
    r = QUERIES["eval_brier_ece"].fn(spark, d).collect()[0]
    assert (r["brier_ppm"], r["ece_ppm"]) == (1_000_000, 1_000_000)


def test_mcc_perfect_inverted_degenerate(spark, tmp_path):
    """Perfect threshold classifier scores +1e6 ppm, a fully inverted
    one -1e6 ppm, and a single-class corpus defines MCC = 0."""
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    d = str(tmp_path)
    # perfect: purchases score 90 (>= 50), clicks score 10
    rows = [(i, ts, 1, "purchase", 90.0, "{}") for i in range(5)]
    rows += [(5 + i, ts, 1, "click", 10.0, "{}") for i in range(5)]
    _write_events(spark, d, rows)
    r = QUERIES["eval_mcc"].fn(spark, d).collect()[0]
    assert (r["tp"], r["tn"], r["fp"], r["fn"]) == (5, 5, 0, 0)
    assert r["mcc_ppm"] == 1_000_000

    # inverted
    rows = [(i, ts, 1, "purchase", 10.0, "{}") for i in range(5)]
    rows += [(5 + i, ts, 1, "click", 90.0, "{}") for i in range(5)]
    _write_events(spark, d, rows)
    r = QUERIES["eval_mcc"].fn(spark, d).collect()[0]
    assert r["mcc_ppm"] == -1_000_000

    # degenerate: only one true class -> marginal product 0 -> MCC 0
    rows = [(i, ts, 1, "click", 90.0 if i % 2 else 10.0, "{}")
            for i in range(6)]
    _write_events(spark, d, rows)
    r = QUERIES["eval_mcc"].fn(spark, d).collect()[0]
    assert r["mcc_ppm"] == 0


def test_cusum_accumulates_and_alarms(spark, tmp_path):
    """Hand-walked CUSUM: k=3000, h=20000. A user drifting +5000 cents
    over k accumulates 2000/step, alarms at step 10, resets, and ends
    mid-accumulation; a below-reference user stays at 0 forever."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    d = str(tmp_path)
    rows = []
    # user 1: value 50.00 -> v=5000, pre_n = 2000*n; crosses 20000 at
    # n=10 (alarm, reset), again at n=20; 25 events -> final 2000*5
    for i in range(25):
        rows.append((i, base + datetime.timedelta(seconds=i), 1,
                     "click", 50.0, "{}"))
    # user 2: value 10.00 -> v-k < 0 every step -> S pinned at 0
    for i in range(5):
        rows.append((100 + i, base + datetime.timedelta(seconds=i), 2,
                     "click", 10.0, "{}"))
    _write_events(spark, d, rows)
    out = {
        r["user_id"]: r
        for r in QUERIES["events_cusum_drift"].fn(spark, d).collect()
    }
    u1 = out[1]
    assert (u1["n_events"], u1["n_alarms"]) == (25, 2)
    assert u1["final_s"] == 2000 * 5
    assert u1["max_s"] == 20000
    u2 = out[2]
    assert (u2["n_events"], u2["n_alarms"], u2["final_s"], u2["max_s"]) \
        == (5, 0, 0, 0)


def test_oov_audit_vocab_boundary(spark, tmp_path):
    """With the vocab = top-24 tokens, docs made only of vocab tokens
    are absent; a doc with rare tokens reports the exact OOV share."""
    d = str(tmp_path)
    rows = []
    # 24 vocab tokens, each very frequent (appear in filler docs)
    vocab_toks = [f"v{i:02d}" for i in range(24)]
    for i in range(20):
        rows.append((i, " ".join(vocab_toks), "en", "s", 100))
    # doc 100: 3 vocab tokens + 1 rare token -> 250000 ppm OOV
    rows.append((100, "v00 v01 v02 rareword", "en", "s", 20))
    # doc 101: all vocab -> absent
    rows.append((101, "v00 v01 v02 v03", "en", "s", 15))
    _write_docs(spark, d, rows)
    out = {
        r["doc_id"]: r
        for r in QUERIES["tokenizer_oov_audit"].fn(spark, d).collect()
    }
    assert set(out) == {100}
    r = out[100]
    assert (r["n_tok"], r["n_oov"], r["oov_ppm"]) == (4, 1, 250_000)


def test_spearman_monotone_inverted_and_tied(spark, tmp_path):
    """A strictly increasing relation scores +1e6, a decreasing one
    -1e6; heavy ties shrink |rho| but the midrank formula keeps the
    sign (hand-checkable on 4 rows)."""
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    d = str(tmp_path)
    # props length grows with value -> rho = +1
    rows = [(i, ts, 1, "click", float(i + 1), "x" * (i + 1))
            for i in range(8)]
    _write_events(spark, d, rows)
    r = QUERIES["eval_spearman_rho"].fn(spark, d).collect()[0]
    assert (r["n"], r["rho_ppm"]) == (8, 1_000_000)

    # inverted
    rows = [(i, ts, 1, "click", float(i + 1), "x" * (9 - i))
            for i in range(8)]
    _write_events(spark, d, rows)
    r = QUERIES["eval_spearman_rho"].fn(spark, d).collect()[0]
    assert r["rho_ppm"] == -1_000_000

    # constant y side -> variance 0 -> defined rho 0
    rows = [(i, ts, 1, "click", float(i + 1), "xyz") for i in range(8)]
    _write_events(spark, d, rows)
    r = QUERIES["eval_spearman_rho"].fn(spark, d).collect()[0]
    assert r["rho_ppm"] == 0


def test_kcenter_picks_planted_extremes(spark, tmp_path):
    """Three tight blobs + the smallest-id seed: the traversal must
    visit each blob before revisiting any (farthest-first), and
    selection distances are non-increasing."""
    d = str(tmp_path)
    rows = []
    def vec(axis, mag):
        v = [0.0] * 64
        v[axis] = mag
        return v
    # blob A near origin-axis 0 (ids 0..3, id 0 seeds)
    for i in range(4):
        rows.append((i, vec(0, 1.0 + 0.001 * i), 0))
    # blob B far on axis 1 (ids 10..13)
    for i in range(4):
        rows.append((10 + i, vec(1, 9.0 + 0.001 * i), 1))
    # blob C far on axis 2 (ids 20..23)
    for i in range(4):
        rows.append((20 + i, vec(2, 9.0 + 0.001 * i), 2))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    out = sorted(
        QUERIES["sample_kcenter_coreset"].fn(spark, d).collect(),
        key=lambda r: r["center_rank"],
    )
    assert len(out) == 8 and out[0]["vec_id"] == 0
    # first three picks cover all three blobs
    blobs = [r["vec_id"] // 10 for r in out[:3]]
    assert sorted(blobs) == [0, 1, 2]
    # selection distances never increase after pick 2
    dists = [r["sel_dist"] for r in out[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:]))


def test_assortativity_star_is_minus_one(spark, tmp_path):
    """A pure star (one supplier serving many customers) is maximally
    disassortative: every edge pairs degree n with degree 1 -> r = -1
    exactly (floor gives -1e6 ppm)."""
    d = str(tmp_path)
    # one supplier (1) x 6 customers via 6 orders
    spark.createDataFrame(
        [(i, 1) for i in range(6)], "l_orderkey long, l_suppkey long"
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    spark.createDataFrame(
        [(i, 100 + i) for i in range(6)], "o_orderkey long, o_custkey long"
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    r = QUERIES["graph_degree_assortativity"].fn(spark, d).collect()[0]
    assert r["n"] == 12  # 6 undirected edges, both directions
    assert r["assortativity_ppm"] == -1_000_000


def test_gini_equal_and_concentrated(spark, tmp_path):
    """Equal values score Gini 0; full concentration on one of n rows
    scores (n-1)/n exactly."""
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    d = str(tmp_path)
    rows = [(i, ts, 1, "flat", 5.0, "{}") for i in range(8)]
    rows += [(100 + i, ts, 1, "conc", 10.0 if i == 0 else 0.0, "{}")
             for i in range(8)]
    _write_events(spark, d, rows)
    out = {
        r["event_type"]: r
        for r in QUERIES["w_gini_by_group"].fn(spark, d).collect()
    }
    assert out["flat"]["gini_ppm"] == 0
    # one-holder concentration: G = (n-1)/n = 7/8 = 875000 ppm
    assert out["conc"]["gini_ppm"] == 875_000


def test_compaction_plan_contiguous_target_bins(spark, tmp_path):
    """Uniform 100-byte files pack ~82 to a bin at the 8192 target;
    bins are contiguous, disjoint, and cover every file exactly once."""
    d = str(tmp_path)
    _write_docs(
        spark, d, [(i, "x", "en", "s", 100) for i in range(200)]
    )
    rows = sorted(
        QUERIES["maintenance_compaction_plan"].fn(spark, d).collect(),
        key=lambda r: r["bin_id"],
    )
    assert sum(r["n_files"] for r in rows) == 200
    # exclusive prefix sum: floor(8192/100)+1 = 82 files reach a bin
    assert rows[0]["n_files"] == 82
    assert rows[0]["first_file"] == 0 and rows[0]["last_file"] == 81
    for a, b in zip(rows, rows[1:]):
        assert b["first_file"] == a["last_file"] + 1  # contiguous ranges
        assert b["bin_id"] == a["bin_id"] + 1


def test_late_interaction_prefers_token_identity(spark, tmp_path):
    """A candidate sharing ALL of the query's tokens scores the exact
    self-similarity (every MaxSim term hits its identical vector, and a
    vector's self-dot is the max possible dot against it); a
    disjoint-token candidate is never retrieved at rank 1."""
    d = str(tmp_path)
    docs = [
        (0, "alpha beta gamma delta", "en", "s", 22),   # query
        (3, "alpha beta gamma delta", "en", "s", 22),   # exact copy
        (4, "alpha beta something else", "en", "s", 25),  # partial
        (5, "totally disjoint tokens here", "en", "s", 28),
    ]
    _write_docs(spark, d, docs)
    out = QUERIES["sim_late_interaction_topk"].fn(spark, d).collect()
    by_rank = {r["rank"]: r for r in out if r["query_id"] == 0}
    assert by_rank[1]["neighbor_id"] == 3
    # self-score upper-bounds every other candidate's score
    assert by_rank[1]["maxsim"] >= by_rank[2]["maxsim"]
    retrieved = {r["neighbor_id"] for r in out}
    assert 5 not in retrieved  # no shared token -> never a candidate


def test_retention_vacuum_keeps_time_travel_floor(spark, tmp_path):
    """A user with versions straddling the watermark keeps the newest
    pre-watermark version (the time-travel floor) and deletes the rest;
    a user with only fresh versions emits no row."""
    import datetime

    d = str(tmp_path)
    base = datetime.datetime(2024, 1, 31)  # becomes MAX(ts)
    old = lambda days: base - datetime.timedelta(days=days)
    rows = [
        # user 1: versions at -20d, -15d, -10d (all pre-watermark), -1d
        (1, old(20), 1, "v", 0.0, "{}"),
        (2, old(15), 1, "v", 0.0, "{}"),
        (3, old(10), 1, "v", 0.0, "{}"),
        (4, old(1), 1, "v", 0.0, "{}"),
        # user 2: everything within retention
        (5, old(2), 2, "v", 0.0, "{}"),
        (6, old(0), 2, "v", 0.0, "{}"),
    ]
    _write_events(spark, d, rows)
    out = {r["user_id"]: r
           for r in QUERIES["retention_vacuum_plan"].fn(spark, d).collect()}
    assert set(out) == {1}
    r = out[1]
    assert r["n_versions"] == 4
    assert r["n_pre_watermark"] == 3
    assert r["n_deletable"] == 2
    assert r["floor_event_id"] == 3  # newest pre-watermark version


def test_bloom_prefilter_superset_of_exact(spark, tmp_path):
    """Bloom admission is a SUPERSET of the exact semi-join (no false
    negatives, by construction) and counts are internally consistent."""
    d = str(tmp_path)
    spark.createDataFrame(
        [(i, 5 if i < 10 else 50) for i in range(200)],
        "p_partkey long, p_size long",
    ).write.mode("overwrite").parquet(f"{d}/part.parquet")
    spark.createDataFrame(
        [(i % 200,) for i in range(1000)], "l_partkey long"
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    r = QUERIES["join_bloom_prefilter_audit"].fn(spark, d).collect()[0]
    assert r["build_keys"] == 10
    assert r["probe_rows"] == 1000
    assert r["exact_rows"] == 50  # 10 keys x 5 rows each
    assert r["bloom_pass_rows"] >= r["exact_rows"]  # no false negatives
    assert r["bits_set"] <= 2 * r["build_keys"]


def test_rate_limit_bucket_admits_and_refills(spark, tmp_path):
    """Burst of 5 instant events: the full 3-token bucket admits 3,
    rejects 2; after a 12 h gap (2 refills) the next 3 admit 2."""
    import datetime

    d = str(tmp_path)
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(i, t0 + datetime.timedelta(seconds=i), 1, "e", 0.0, "{}")
            for i in range(5)]
    later = t0 + datetime.timedelta(hours=12, minutes=1)
    rows += [(10 + i, later + datetime.timedelta(seconds=i), 1, "e", 0.0,
              "{}") for i in range(3)]
    _write_events(spark, d, rows)
    r = QUERIES["stream_rate_limit_audit"].fn(spark, d).collect()[0]
    assert r["n_events"] == 8
    assert r["n_admitted"] == 3 + 2
    assert r["n_rejected"] == 3
    assert r["final_tokens"] == 0


def test_auc_ppm_survives_big_pair_counts(spark, tmp_path):
    """Round-11 100x-replica regression: 1e6 * pairs-won overflows int64
    once n_pos*n_neg passes ~9.2e12 (hit for real at 10 M events), so
    the ppm arithmetic must run in DECIMAL(38,0). 3.2 M events per class
    at two score levels (positives above negatives -> AUC exactly 1.0)
    puts won2 = 2*n_pos*n_neg ~ 2e13 — the old expression raised
    ARITHMETIC_OVERFLOW here; the fixed one must return exact ppm."""
    from pyspark.sql import functions as F

    d = str(tmp_path)
    n = 3_200_000
    spark.range(2 * n).select(
        F.col("id").alias("event_id"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        F.when(F.col("id") < n, "purchase").otherwise("click")
        .alias("event_type"),
        F.when(F.col("id") < n, 2.0).otherwise(1.0).alias("value"),
        F.lit("{}").alias("props"),
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    r = QUERIES["eval_auc_exact"].fn(spark, d).collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (n, n)
    assert r["auc_ppm"] == 1_000_000  # separable, exact even at 2e13 pairs
