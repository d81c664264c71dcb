"""SemDeDup scale behavior (round-6 finding): with a FIXED cell count the
within-cell pair scoring is quadratic in corpus size — 10x data means
~100x pairs — which is exactly what the operator docstring documents
('at 100 TB you raise n_cells so cells stay bounded', the SemDeDup paper
uses ~100k clusters for LAION). This script measures both sides of that
claim on the local 10x dataset:

  * fixed cells (n_cells=8) at sf0.1 vs sf1  -> expected super-linear
  * scaled cells (n_cells=8 at sf0.1, 80 at sf1, constant expected cell
    size) -> expected ~linear

Usage: python scripts/semdedup_scale.py [mode]  (mode: fixed|scaled|both)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from youtube_trending_data_pipeline_spark.catalog import t
from youtube_trending_data_pipeline_spark.operators.dedup import semdedup_keepers
from youtube_trending_data_pipeline_spark.session import get_spark


def run(spark, sf_dir, n_cells):
    t0 = time.perf_counter()
    out = semdedup_keepers(
        t(spark, sf_dir, "embeddings"), n_cells=n_cells
    )
    out.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "scaled"
    spark = get_spark(app_name="semdedup-scale")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/Arrow path once so the first measured run is not
    # charged session startup (without this the sf0.1 base reads ~2x
    # high and the sf1 ratio looks sub-1x)
    run(spark, "/root/testdata/sf0.1", 8)
    base = run(spark, "/root/testdata/sf0.1", 8)
    print(f"sf0.1 n_cells=8: {base:.2f} s", flush=True)
    if mode in ("scaled", "both"):
        scaled = run(spark, "/tmp/sf1", 80)
        print(
            f"sf1   n_cells=80 (constant cell size): {scaled:.2f} s "
            f"(ratio {scaled / base:.1f}x)",
            flush=True,
        )
    if mode in ("fixed", "both"):
        fixed = run(spark, "/tmp/sf1", 8)
        print(
            f"sf1   n_cells=8 (fixed): {fixed:.2f} s "
            f"(ratio {fixed / base:.1f}x)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
