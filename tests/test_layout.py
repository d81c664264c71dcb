"""Layout maintenance: compaction hits the target file count without row
loss; Z-order clustering makes per-file min/max ranges narrow on BOTH
cluster columns (the data-skipping property), where a plain sort only
narrows the leading column."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from youtube_trending_data_pipeline_spark.sources.layout import compact, zorder_write

SF = "/root/testdata/sf0.001"


def _files(path):
    return [f for f in glob.glob(f"{path}/*.parquet")]


def _avg_range_frac(spark, path, col, lo, hi):
    """Mean fraction of the global [lo,hi] range each file's min/max spans."""
    fracs = []
    for f in _files(path):
        r = spark.read.parquet(f).agg(F.min(col), F.max(col)).collect()[0]
        fracs.append((r[1] - r[0]) / (hi - lo))
    return sum(fracs) / len(fracs)


def test_compact_reduces_file_count(spark, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "compacted")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.repartition(64).write.parquet(src)
    assert len(_files(src)) == 64

    n = compact(spark, src, dst, target_file_mb=128)
    assert n == 1  # sf0.001 events ≪ 128 MB
    assert len(_files(dst)) == 1
    assert spark.read.parquet(dst).count() == ev.count()


def test_zorder_skips_on_both_columns(spark, tmp_path):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    lo1, hi1, lo2, hi2 = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).collect()[0]

    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "sorted")
    zorder_write(li, zdir, "l_orderkey", "l_partkey", num_files=16)
    # baseline: single-column sort, same file count
    li.repartitionByRange(16, "l_orderkey").sortWithinPartitions(
        "l_orderkey"
    ).write.parquet(sdir)

    assert spark.read.parquet(zdir).count() == li.count()

    z1 = _avg_range_frac(spark, zdir, "l_orderkey", lo1, hi1)
    z2 = _avg_range_frac(spark, zdir, "l_partkey", lo2, hi2)
    s1 = _avg_range_frac(spark, sdir, "l_orderkey", lo1, hi1)
    s2 = _avg_range_frac(spark, sdir, "l_partkey", lo2, hi2)

    # sorted layout: near-perfect on the lead column, useless on the other
    assert s1 < 0.25 and s2 > 0.8
    # z-order: BOTH columns substantially narrower than the full range
    # 16 files = 4 interleaved bits -> ~4x4 grid: ~1/4 range per axis
    assert z1 < 0.45 and z2 < 0.45, (z1, z2)
    # and strictly better than the sorted layout on the non-lead column
    assert z2 < s2 / 2
