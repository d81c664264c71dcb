"""Scale measurement of the BUCKETED mutual-kNN build
(catalog_analysis._mutual_knn_edges) — the semdedup_scale.py doctrine
applied to the graph-structure family's candidate generation.

The build is quadratic WITHIN cells only. Since round 8 the cell count
is CORPUS-RELATIVE in-code (n_cells = GREATEST(_MKNN_CELLS_MIN,
n // _MKNN_CELL_SIZE), both engines deriving it from COUNT(*)), so the
honest scale number is just the build at sf0.1 (2 k vectors -> 8
cells) vs the 10x replica /tmp/sf1 (20 k vectors -> 80 cells). A
fixed-8-cells worst-case row (cell size forced huge so the floor
binds) is kept for contrast — that was the r7 gate configuration whose
super-linearity motivated the in-code knob.

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


def timed_build(spark, sf_dir: str, cell_size: int) -> tuple[float, int]:
    ca._MKNN_CELL_SIZE = cell_size
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
    base_size = ca._MKNN_CELL_SIZE
    runs = [
        ("/root/testdata/sf0.1", base_size, "gate (corpus-relative cells)"),
        ("/tmp/sf1", base_size, "10x data (corpus-relative cells)"),
        ("/tmp/sf1", 1 << 30, "10x data, cells pinned at the floor (old r7 worst case)"),
    ]
    results = []
    try:
        for sf_dir, cell_size, label in runs:
            sec, edges = timed_build(spark, sf_dir, cell_size)
            results.append((sf_dir, label, sec, edges))
            print(
                json.dumps(
                    {
                        "sf_dir": sf_dir,
                        "cell_size": cell_size,
                        "label": label,
                        "sec": round(sec, 2),
                        "mutual_edges": edges,
                    }
                ),
                flush=True,
            )
    finally:
        ca._MKNN_CELL_SIZE = base_size
    base = results[0][2]
    print()
    print("| run | sec | vs sf0.1 |")
    print("|---|---|---|")
    for sf_dir, label, sec, _ in results:
        print(f"| {label} | {sec:.2f} | {sec / base:.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
