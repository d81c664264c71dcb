"""SemDeDup cost curve on CLUSTERED embeddings across the 50x corpus
range (round-10 handoff item: the 100 k recall point exists for the
mutual-kNN family; the semdedup COST curve at the same octaves does
not).

Reuses the deterministic mixture-of-Gaussians fixture from
scripts/mutual_knn_clustered_recall.py (no RNG anywhere) and runs the
production semdedup_keepers with the corpus-relative cell knob the
catalog entry derives (n_cells = GREATEST(8, n // 250) — constant
expected cell size, so the within-cell Gram stays bounded and total
work should grow ~linearly in n).

Clustered data is the HARD case for the cost claim, not the easy one:
cells fill unevenly (a popular cluster's members all hash to the same
few pivot cells), so this measures the knob schedule under realistic
skew — the 12,500-member cell cap plus row-block Gram (dedup.py round
9) is what keeps the worst cell bounded.

Prints one JSON line per corpus size: n, cells, wall seconds (min of
2), keepers count. Results recorded in SCALING.md (SemDeDup section).

Usage: python scripts/semdedup_clustered_cost.py [n ...]
       (default sizes: 2000 20000 50000 100000)
"""

from __future__ import annotations

import json
import os
import sys
import time

# repo root for the package import; the scripts dir itself for the
# sibling-module import (bare `import mutual_knn_clustered_recall` only
# resolves when run as a script — pytest/-m/REPL need the explicit entry)
_SCRIPTS_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS_DIR))
sys.path.insert(0, _SCRIPTS_DIR)

from mutual_knn_clustered_recall import FIXTURE_ROOT, build_fixture  # noqa: E402

from youtube_trending_data_pipeline_spark.operators.dedup import (  # noqa: E402
    semdedup_keepers,
)
from youtube_trending_data_pipeline_spark.session import get_spark  # noqa: E402


def run_once(spark, path: str, n_cells: int) -> tuple[float, int]:
    df = spark.read.parquet(os.path.join(path, "embeddings.parquet"))
    t0 = time.perf_counter()
    out = semdedup_keepers(df, n_cells=n_cells)
    kept = out.where("kept").count()
    return time.perf_counter() - t0, kept


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [
        2_000,
        20_000,
        50_000,
        100_000,
    ]
    spark = get_spark(app_name="semdedup-clustered-cost")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/Arrow path once (the semdedup_scale.py doctrine)
    d0 = os.path.join(FIXTURE_ROOT, f"n{sizes[0]}")
    build_fixture(sizes[0], d0)
    run_once(spark, d0, max(8, sizes[0] // 250))
    for n in sizes:
        d = os.path.join(FIXTURE_ROOT, f"n{n}")
        build_fixture(n, d)
        cells = max(8, n // 250)
        secs, kept = min(
            (run_once(spark, d, cells) for _ in range(2)),
            key=lambda r: r[0],
        )
        print(
            json.dumps(
                {
                    "run": f"semdedup clustered {n}",
                    "n": n,
                    "cells": cells,
                    "wall_sec": round(secs, 2),
                    "keepers": kept,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
