"""Round-7 scale measurement of the BUCKETED mutual-kNN build
(catalog_analysis._mutual_knn_edges) — the semdedup_scale.py doctrine
applied to the graph-structure family's candidate generation.

The build is quadratic WITHIN cells only, so the documented 100 TB knob
is n_cells scaling with the corpus (constant expected cell size). This
script measures the build at sf0.1 (2 k vectors) and at the 10x replica
/tmp/sf1 (20 k vectors, scripts/gen_scale_data.py) twice: once with the
entry's fixed gate constants (8 cells — worst case, cell size grows
10x), once with cells scaled 10x (80 cells — the knob applied). The
fixed-knob ratio is expected super-linear BY DESIGN; the scaled-knob
ratio is the honest scale number.

Usage: python scripts/mutual_knn_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import youtube_trending_data_pipeline_spark.catalog_analysis as ca
from youtube_trending_data_pipeline_spark.session import get_spark


def timed_build(spark, sf_dir: str, cells: int, probe: int) -> tuple[float, int]:
    ca._MKNN_CELLS = cells
    ca._MKNN_PROBE = probe
    best, edges = None, None
    for _ in range(2):
        t0 = time.perf_counter()
        edges = ca._mutual_knn_edges(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, edges


def main() -> None:
    spark = get_spark(app_name="mutual-knn-scale")
    spark.sparkContext.setLogLevel("ERROR")
    base_cells, base_probe = ca._MKNN_CELLS, ca._MKNN_PROBE
    runs = [
        ("/root/testdata/sf0.1", base_cells, base_probe, "gate knobs"),
        ("/tmp/sf1", base_cells, base_probe, "fixed knobs (worst case)"),
        ("/tmp/sf1", base_cells * 10, base_probe, "cells scaled 10x (the knob)"),
    ]
    results = []
    try:
        for sf_dir, cells, probe, label in runs:
            sec, edges = timed_build(spark, sf_dir, cells, probe)
            results.append((sf_dir, cells, label, sec, edges))
            print(
                json.dumps(
                    {
                        "sf_dir": sf_dir,
                        "cells": cells,
                        "probe": probe,
                        "label": label,
                        "sec": round(sec, 2),
                        "mutual_edges": edges,
                    }
                ),
                flush=True,
            )
    finally:
        ca._MKNN_CELLS, ca._MKNN_PROBE = base_cells, base_probe
    base = results[0][3]
    print()
    print("| run | cells | sec | vs sf0.1 |")
    print("|---|---|---|---|")
    for sf_dir, cells, label, sec, _ in results:
        print(f"| {label} | {cells} | {sec:.2f} | {sec / base:.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
