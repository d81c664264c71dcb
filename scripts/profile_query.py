"""Round-13 optimization profiler: time + plan-dump individual catalog
queries in isolation.

Usage:
  python scripts/profile_query.py NAME [NAME ...] [--reps N] [--plan DIR]

Times each query with the noop sink (guide 1.4) on a warm session,
min-of-N (default 3), and optionally writes .explain("formatted") to
DIR/<name>.txt. Jobs are labelled (guide 1.5).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from youtube_trending_data_pipeline_spark.catalog import QUERIES, _load_extensions
from youtube_trending_data_pipeline_spark.session import get_spark

_load_extensions()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plan", default=None, help="dir to write explain output")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(app_name="profile_r13")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM + parquet footers
    QUERIES["q1_pricing_summary"].fn(spark, args.sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    for name in args.names:
        spec = QUERIES[name]
        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            df = spec.fn(spark, args.sf_dir)
            with open(os.path.join(args.plan, f"{name}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted")))
        best = None
        times = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            spec.fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            times.append(dt)
            best = dt if best is None else min(best, dt)
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: min={best:.3f}s all={[round(x, 3) for x in times]}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
