"""Scale-bug hunt: run registry entries' SPARK side only at a big replica.

Catches the bug class gate-SF data can never trigger — ANSI overflow,
hash-family degeneracy, memory floors, quadratic blocks (round 11 found
three real bugs this way: eval_auc_exact int64 ppm overflow, the
near-order-preserving MinHash permutation family, the 8g iterative-graph
heap floor).  Counts rows only; the sf0.01 driver gate owns value
correctness, this owns does-it-still-run-and-scale.

Usage:
    python scripts/scale_hunt.py SF_DIR [NAMES] [--append OUT.jsonl]

NAMES is a comma list, or @file with one name per line; default = whole
registry.  One JSON line per entry: {"q", "rows"|"err", "sec"}.  Run in
fresh-session chunks of ~20 (a single long session accumulates
localCheckpoint blocks and eventually dies); the loop revives the
session if an entry kills the JVM so one failure never ends the chunk.

Replica generation: python scripts/gen_scale_data.py /root/testdata/sf0.1 /tmp/sf10 100
"""
import json
import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from youtube_trending_data_pipeline_spark.catalog import QUERIES, _load_extensions  # noqa: E402
from youtube_trending_data_pipeline_spark.session import get_spark  # noqa: E402


def _names(arg: str | None) -> list[str]:
    if not arg:
        return list(QUERIES)
    if arg.startswith("@"):
        with open(arg[1:]) as fh:
            return [ln.strip() for ln in fh if ln.strip()]
    return arg.split(",")


def _alive(s) -> bool:
    try:
        return not s.sparkContext._jsc.sc().isStopped()
    except Exception:
        return False


def main() -> None:
    sf_dir = sys.argv[1]
    names = _names(sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else None)
    out = sys.stdout
    if "--append" in sys.argv:
        out = open(sys.argv[sys.argv.index("--append") + 1], "a")

    _load_extensions()
    spark = get_spark(app_name="scale-hunt")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        if not _alive(spark):
            # previous entry killed the JVM (e.g. heap OOM) — the cached
            # py4j gateway points at the dead process, so reset it too
            # or the relaunch raises instead of starting a new JVM
            try:
                spark.stop()
            except Exception:
                pass
            from pyspark import SparkContext
            from pyspark.sql import SparkSession

            SparkSession._instantiatedSession = None
            SparkSession._activeSession = None
            SparkContext._active_spark_context = None
            SparkContext._gateway = None
            SparkContext._jvm = None
            spark = get_spark(app_name="scale-hunt-revived")
            spark.sparkContext.setLogLevel("ERROR")
        rec: dict = {"q": name}
        t0 = time.perf_counter()
        try:
            rec["rows"] = QUERIES[name].fn(spark, sf_dir).count()
            rec["ok"] = True
        except Exception as e:  # noqa: BLE001 - the hunt must report, not die
            msg = str(e)
            for key in (
                "ARITHMETIC_OVERFLOW", "DIVIDE_BY_ZERO", "CAST_OVERFLOW",
                "NUMERIC_VALUE_OUT_OF_RANGE", "USER_RAISED_EXCEPTION",
            ):
                if key in msg:
                    rec["err_class"] = key
                    break
            else:
                rec["err_class"] = "OTHER"
            rec["err"] = msg[:200].replace("\n", " ")
            rec["ok"] = False
        rec["sec"] = round(time.perf_counter() - t0, 1)
        out.write(json.dumps(rec) + "\n")
        out.flush()
    spark.stop()


if __name__ == "__main__":
    main()
