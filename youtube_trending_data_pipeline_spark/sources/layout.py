"""Data-layout maintenance: small-file compaction and Z-order clustering.

The reference appends one BigQuery load per day and lets the warehouse
manage layout (`dags/trending_daily_ingestion.py:191-208`). A self-managed
Parquet lakehouse has to do this itself: daily appends accumulate small
files (kill scan parallelism bookkeeping, inflate listing time), and
multi-column point/range queries only skip row groups if values are
clustered. Both jobs here are one-shot batch rewrites — the 100 TB cadence
is "compact yesterday's partition after the last append".
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _total_bytes(spark: SparkSession, path: str) -> int:
    """Sum file sizes under ``path`` via the Hadoop FS API (works on any
    supported filesystem — local, HDFS, object stores)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    total = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            total += st.getLen()
    return total


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 128,
) -> int:
    """Rewrite ``src`` parquet into ``dst`` with ~``target_file_mb`` files.

    File count = ceil(input_bytes / target). Uses round-robin
    ``repartition(n)`` (no shuffle key needed — compaction is about file
    count, not order); returns the file count chosen. Run per partition
    directory so the rewrite unit stays bounded at scale.
    """
    df = spark.read.parquet(src)
    n = max(1, math.ceil(_total_bytes(spark, src) / (target_file_mb * 1024 * 1024)))
    df.repartition(n).write.mode("overwrite").parquet(dst)
    return n


def zorder_key(
    c1: Column, c2: Column, min1: Column, max1: Column, min2: Column, max2: Column,
    bits: int = 16,
) -> Column:
    """Morton (Z-order) interleave of two columns, each min/max-normalized
    to ``bits`` bits. Pure JVM bit arithmetic — stays in whole-stage
    codegen; no UDF."""
    scale = (1 << bits) - 1
    n1 = F.least(
        F.lit(scale),
        ((c1.cast("double") - min1) * scale / F.nullif(max1 - min1, F.lit(0))).cast(
            "long"
        ),
    )
    n2 = F.least(
        F.lit(scale),
        ((c2.cast("double") - min2) * scale / F.nullif(max2 - min2, F.lit(0))).cast(
            "long"
        ),
    )
    n1 = F.coalesce(n1, F.lit(0))
    n2 = F.coalesce(n2, F.lit(0))
    z = F.lit(0).cast("long")
    for i in range(bits):
        bit1 = F.shiftright(n1, i).bitwiseAND(F.lit(1))
        bit2 = F.shiftright(n2, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(bit1, 2 * i + 1)).bitwiseOR(
            F.shiftleft(bit2, 2 * i)
        )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    col1: str,
    col2: str,
    num_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered on the Z-order curve of (col1, col2).

    Range-partition + sort on the morton key ⇒ each output file covers a
    small rectangle of the (col1, col2) value space, so parquet row-group
    min/max stats prune scans filtered on EITHER column — the property a
    single-column sort only gives you for the leading column. The min/max
    normalization constants come from one tiny pre-aggregate."""
    stats = df.agg(
        F.min(col1).alias("min1"), F.max(col1).alias("max1"),
        F.min(col2).alias("min2"), F.max(col2).alias("max2"),
    ).collect()[0]
    key = zorder_key(
        F.col(col1), F.col(col2),
        F.lit(float(stats["min1"])), F.lit(float(stats["max1"])),
        F.lit(float(stats["min2"])), F.lit(float(stats["max2"])),
        bits=bits,
    )
    (
        df.withColumn("__z", key)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
