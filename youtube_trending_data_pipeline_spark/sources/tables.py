"""Silver/gold table IO over partitioned Parquet.

Replaces the reference's BigQuery ``load_table_from_dataframe`` sinks
(dags/trending_daily_ingestion.py:191-208, trending_daily_aggregates.py:93-105)
and its Airflow branch-skip idempotency (ing:47-55, agg:28-43) with the
Spark-idiomatic dynamic partition overwrite: re-running a date is
idempotent by construction instead of skipped.

Layout: every table partitioned by ``date`` so the daily/weekly scans
(S6/S7) prune partitions instead of filtering rows — at 100 TB that is the
difference between reading one day and reading the lake.

Object-store deployment (the reference's GCS bronze + BigQuery silver,
ing:83-91): every path in this module goes through Spark's Hadoop
FileSystem layer, so pointing the pipeline at ``s3a://bucket/...`` or
``gs://bucket/...`` is a config change (the relevant connector jar +
credentials confs), not a code change — tests exercise this with
scheme-qualified ``file://`` URIs. For cloud object stores also set a
cloud-optimized committer (e.g. the S3A magic committer) since
rename-based commits are O(data) there.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def append_partitioned(df: DataFrame, path: str, partition_col: str = "date") -> None:
    """WRITE_APPEND parity (S10). Prefer overwrite_date_partition for re-runs."""
    df.write.mode("append").partitionBy(partition_col).parquet(path)


def overwrite_date_partition(
    df: DataFrame,
    path: str,
    partition_col: str = "date",
    sort_cols: list[str] | None = None,
) -> None:
    """Idempotent daily load: replaces only the partitions present in ``df``
    (spark.sql.sources.partitionOverwriteMode=dynamic, set in session.py).
    This subsumes the reference's existence-probe branch (C1).

    ``sort_cols``: cluster rows inside each file (sortWithinPartitions) so
    parquet row-group min/max statistics prune point/range scans on those
    columns — data-skipping beyond partition pruning, free at write time.
    """
    if sort_cols:
        # lead with the partition column: the file writer requires rows
        # ordered by partition expression and would re-sort (unstably),
        # destroying the clustering, unless that ordering already holds
        df = df.sortWithinPartitions(partition_col, *sort_cols)
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def partition_exists(spark: SparkSession, path: str, date: dt.date) -> bool:
    """Existence probe (S8: ``SELECT id ... LIMIT 1``) — kept for parity with
    the reference's branch operator; partition pruning makes it O(one
    partition's footer), and ``limit(1).isEmpty()`` short-circuits."""
    try:
        df = spark.read.parquet(path)
    except Exception:
        return False
    return not df.where(F.col("date") == F.lit(date)).limit(1).isEmpty()
