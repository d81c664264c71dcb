"""Scale measurement of the IVF/PQ retrieval family (VERDICT r9 item 4
"Done" criterion): per-query cost at sf0.1 (2 k vectors) vs the 10x
replica /tmp/sf1 (20 k vectors), under

  * the round-10 CORPUS-RELATIVE knobs (operators/similarity.ivf_knobs
    + pq_codebook_size: cells = GREATEST(8, n/250), probe ~
    sqrt(cells), codebook = LEAST(256, cells)) — the production
    configuration, and
  * the retired FIXED (8, 3, 8) knobs as contrast — the configuration
    whose candidates/query grow as n/cells (the r9 handoff item).

Candidate volume is the real scale signal (wall time at these sizes is
dominated by plan overhead): with fixed 8 cells a 10x corpus makes
every probed cell 10x bigger, so the re-rank joins 10x the rows per
query; with corpus-relative cells the per-cell size stays ~250 and
candidates/query grow only with probe ~ sqrt(n).

Entries measured end-to-end through the registry (min-of-2, noop sink):
sim_ivf_pivot_topk, sim_ivf_topk, sim_pq_adc_topk, sim_ivfadc_topk.

Usage: python scripts/ivf_scale.py   (needs /tmp/sf1; generate with
scripts/gen_scale_data.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from youtube_trending_data_pipeline_spark.catalog import QUERIES, _load_extensions
from youtube_trending_data_pipeline_spark.operators import similarity as sim
from youtube_trending_data_pipeline_spark.session import get_spark

_load_extensions()

ENTRIES = [
    "sim_ivf_pivot_topk",
    "sim_ivf_topk",
    "sim_pq_adc_topk",
    "sim_ivfadc_topk",
    # round 10: residual-encoding variant (true Jegou) — same knobs,
    # one extra kernel pass (residual PQ encode) + per-probed-cell
    # distance tables
    "sim_ivfadc_residual_topk",
]


def timed(spark, name: str, sf_dir: str) -> float:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    spark = get_spark(app_name="ivf-scale")
    spark.sparkContext.setLogLevel("ERROR")

    real_knobs = sim.ivf_knobs
    real_code = sim.pq_codebook_size
    for mode in ("corpus-relative", "fixed-8"):
        if mode == "fixed-8":
            sim.ivf_knobs = lambda n: (8, 3)
            sim.pq_codebook_size = lambda n: 8
        else:
            sim.ivf_knobs = real_knobs
            sim.pq_codebook_size = real_code
        for sf_dir in ("/root/testdata/sf0.1", "/tmp/sf1"):
            n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
            cells, probe = sim.ivf_knobs(n - 5)
            rec = {
                "mode": mode,
                "sf_dir": sf_dir,
                "n_vectors": n,
                "cells": cells,
                "probe": probe,
                "codebook": sim.pq_codebook_size(n - 5),
            }
            for name in ENTRIES:
                rec[name] = timed(spark, name, sf_dir)
            print(json.dumps(rec), flush=True)
    sim.ivf_knobs = real_knobs
    sim.pq_codebook_size = real_code
    spark.stop()


if __name__ == "__main__":
    main()
