"""Round-6 sf0.1 -> sf1 (10x) scale spot-check over the heaviest registry
entries (VERDICT r5 #4). Runs each entry at /root/testdata/sf0.1 and at
the locally generated /tmp/sf1 (scripts/gen_scale_data.py), 2 reps each
(min taken, noop sink), and prints a markdown ratio table. A ~10x ratio
means the entry is linear in data size on this machine; anything >20x is
flagged super-linear.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from youtube_trending_data_pipeline_spark.catalog import QUERIES, _load_extensions
from youtube_trending_data_pipeline_spark.session import get_spark

_load_extensions()

ENTRIES = os.environ.get("SCALE_ENTRIES","").split(",") if os.environ.get("SCALE_ENTRIES") else [
    "graph_pagerank", "graph_hits", "graph_triangle_count",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "semdedup_keepers", "passage_dedup", "cdc_chunk_dedup",
    "text_winnow_fingerprints", "contamination_check",
    "split_decontaminated_train", "sim_lsh_topk",
    "embedding_gram_matrix", "token_skipgram_pairs",
    "tokenize_to_ids", "ewma_user_value",
    "multimodal_image_features", "multimodal_image_dhash_dedup",
    "multimodal_audio_features", "multimodal_video_frames",
    "sft_render_masked",
]

def run(spark, name, sf_dir):
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best

def main():
    spark = get_spark(app_name="scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    # warm
    QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.1").write.format(
        "noop"
    ).mode("overwrite").save()
    rows = []
    for name in ENTRIES:
        a = run(spark, name, "/root/testdata/sf0.1")
        b = run(spark, name, "/tmp/sf1")
        rows.append((name, a, b, b / a))
        print(json.dumps({"q": name, "sf0.1_s": round(a, 2),
                          "sf1_s": round(b, 2), "ratio": round(b / a, 1)}),
              flush=True)
    print()
    print("| entry | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    for name, a, b, r in sorted(rows, key=lambda x: -x[3]):
        flag = " **SUPER-LINEAR**" if r > 20 else ""
        print(f"| {name} | {a:.2f} | {b:.2f} | {r:.1f}x{flag} |")
    spark.stop()

if __name__ == "__main__":
    main()
