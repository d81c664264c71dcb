"""SparkSession factory with scale-aware defaults.

Designed for a 1000-executor cluster reading ~100 TB; tested on local[N].
The knobs below are the ones that matter at both scales:

* AQE on — runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast-join selection replace hand-tuned partition counts.
* ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; on a
  real cluster you would raise it to ~2-3x total cores and let AQE coalesce.
* Arrow enabled — every pandas_udf / mapInPandas boundary is Arrow-batched.
* Session timezone pinned to UTC — the reference stores naive-UTC
  timestamps (dags/trending_daily_ingestion.py:44-45); pinning makes
  ``to_timestamp`` reproduce them exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def _default_driver_mem() -> str:
    """Size the local single-JVM heap from the machine, not a constant.

    local[N] shares one driver heap across all executor threads; 8g
    starves the iterative graph family's concurrent hash aggregations at
    the 100x replica (round 11: graph_pagerank raised
    AGGREGATE_OUT_OF_MEMORY at 60M lineitem / 10M events on 8g, runs in
    33 s on a 24g heap). But hard-coding 24g would swap/OOM-kill small
    developer boxes (round-12 ADVICE), so: 24g only when the box has
    >= 64 GiB, else the old 8g — and SPARK_GRAFT_DRIVER_MEM always wins.
    A real cluster sizes executors independently; this knob only shapes
    the local harness.
    """
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    try:
        total = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
    except (ValueError, OSError, AttributeError):
        return "8g"
    return "24g" if total >= 64 * 1024**3 else "8g"


def get_spark(
    app_name: str = "youtube-trending-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` so the same code
    runs unchanged under spark-submit on a cluster (where master comes
    from the environment and this argument is left None *and* a session
    already exists).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.ts is parquet TIMESTAMP(NANOS) which Spark cannot
        # read natively; read it as long nanoseconds (catalog.py handles it)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", _default_driver_mem())
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
