"""Benchmark harness (driver contract).

Runs the headline catalog queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion with a count-collapsing action so
timing covers scan+compute+shuffle, not result transfer to the driver.

Round 10 (VERDICT r9 #6 — the r9 driver bench ran CPU-contended and
reported a uniform phantom 1.4x): the DEFAULT is now min-of-2 reps per
query, so even a contended run reports the better of two passes and
queue-position noise (GC pauses, JIT warm-up of a preceding query, a
co-tenant burning cores) cannot masquerade as a regression — the same
protocol PERF.md's isolated re-timings use. ``--single`` restores the
old one-pass mode; ``--isolate N`` raises the rep count. The JSON
contract is unchanged (one line, same keys; ``reps`` records the
protocol). Cross-round comparisons should divide per-query times only
within the same reps protocol — see PERF.md "reading BENCH_rN".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from youtube_trending_data_pipeline_spark.catalog import QUERIES, _load_extensions
from youtube_trending_data_pipeline_spark.session import get_spark

_load_extensions()

# Headline set: one per operator family — scans, joins, aggregation, window,
# top-k, set-op, scalar-heavy, explode — plus the flagship.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q18_large_volume_customer",
    "j1_anti_join",
    "j3_multiway_join",
    "a6_mode_per_group",
    "a8_a9_conditional_agg",
    "w_rank_lag_running",
    "w2_trailing_window",
    "l_topk_per_group",
    "l_global_topk",
    "u1_union_all",
    "f1_duration_parse",
    "j4_explode_tokens",
    "domain_daily_insights",
    "sessionize",
    "dedup_exact",
    "text_stats",
    "sim_bruteforce_topk",
    # round-4 additions: retrieval scoring, iterative graph, quantization
    "text_bm25_score",
    "graph_pagerank",
    "embedding_quantize_int8",
    # round-5 additions: map-side pairwise reductions
    "embedding_gram_matrix",
    "token_skipgram_pairs",
    # round-5 batch-2 additions: second iterative graph op, shingle-heavy
    # leak removal, zero-shuffle winnowing fingerprints
    "graph_hits",
    "split_decontaminated_train",
    "text_winnow_fingerprints",
    # round-5 batch-3: carried-state Arrow fold, window-heavy CDC chunking
    "ewma_user_value",
    "cdc_chunk_dedup",
    # round-6 breadth (VERDICT r5 #5): the heaviest curation/dedup entries
    # so regressions in the newest third of the registry show in bench
    # diffs — banded near-dup joins, cluster-then-dedup, multimodal decode
    # kernels, shingle-heavy decontamination, and the SFT render composite
    "dedup_minhash_lsh",
    "semdedup_keepers",
    "multimodal_image_dhash_dedup",
    "multimodal_image_features",
    "sft_render_masked",
    "passage_dedup",
    "sim_lsh_topk",
    "tokenize_to_ids",
    "contamination_check",
    # round-6 continuation: the new analysis families — iterative edge/
    # vertex peeling over the Arrow-built mutual-kNN graph, blocked
    # entity-resolution scoring, and the arrival-ordered watermark audit
    "graph_kcore_mutual_knn",
    "er_blocked_match_score",
    "late_event_audit",
    # round-7 (VERDICT r6 #5): pin the bucketed mutual-kNN path's second
    # consumer and the recall audit (exact-vs-bucketed edge agreement),
    # plus the corpus-relative-threshold Apriori — the three entries whose
    # scale behavior round 7 changed
    "graph_ktruss_mutual_knn",
    "graph_mutual_knn_recall_audit",
    "apriori_triple_itemsets",
    # round-8 (catalog_quality): margin mining composes the bounded
    # mutual-kNN candidate build; the bootstrap pins the 64-replicate
    # weighted-aggregate shape; the n-gram stream pins the nested-
    # transform explode
    "sim_margin_topk",
    "eval_bootstrap_ci",
    "text_longest_repeated_ngram",
    # round-9: late-interaction retrieval pins the posting-join candidate
    # pool + nested-HOF MaxSim; the rate-limit audit pins the carried-
    # state Arrow fold family's newest member
    "sim_late_interaction_topk",
    "stream_rate_limit_audit",
    # round-10: residual-encoding IVFADC pins the per-probed-cell
    # distance-table shape (the true Jegou formulation) on top of the
    # shared pivot-cell + PQ-encode kernels
    "sim_ivfadc_residual_topk",
    # round-11: the sampled production recall audit pins the
    # bounded-ground-truth shape (hash-sampled exact side + full-corpus
    # LSH side endpoint-filtered through broadcast semi-joins)
    "dedup_minhash_recall_audit_sampled",
]


def main() -> None:
    reps = 2  # min-of-2 default (VERDICT r9 #6)
    if "--single" in sys.argv:
        reps = 1
    if "--isolate" in sys.argv:
        i = sys.argv.index("--isolate")
        reps = (
            int(sys.argv[i + 1])
            if len(sys.argv) > i + 1 and sys.argv[i + 1].isdigit()
            else 2
        )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query times measure the
    # engine, not first-touch JIT/IO
    QUERIES["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Round 13 (measurement robustness, declared in OPTIMIZATION_r13.md):
    # reps are PASS-MAJOR — run the whole query list once, then again,
    # taking the per-query min ACROSS passes. Back-to-back reps of one
    # query both land inside the same transient noise window (this
    # sandbox shows recurring 30-90 s system-time/steal storms, measured
    # r13: the same query scored 42.7 s in one bench run and 5.4 s in
    # the next, isolated 5.2 s), so min-of-2 only defends against noise
    # when the two reps are temporally separated. Per-query methodology
    # is unchanged: same queries, same noop-sink action, same timer,
    # same rep count, min-of-reps.
    best: dict[str, float] = {}
    for _ in range(reps):
        for name in BENCH_QUERIES:
            spec = QUERIES[name]
            t0 = time.perf_counter()
            # noop sink executes the full plan on the executors without
            # collecting rows to the driver
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, dt), dt)
    timings = {name: round(best[name], 3) for name in BENCH_QUERIES}

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "reps": reps,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
