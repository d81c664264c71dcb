"""Schema evolution on the silver layer: daily appends add columns over
time (SURVEY §7 risk (b): raw JSON drifts — optional fields appear).
mergeSchema reads the union; old files yield NULL for new columns; an
explicit read schema projects a stable contract regardless of file
vintage."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merge_schema_union_and_stable_contract(spark, tmp_path):
    path = str(tmp_path / "silver")
    # day 1: v1 schema
    spark.createDataFrame(
        [(1, "a")], "id long, title string"
    ).write.mode("append").parquet(path)
    # day 2: v2 schema adds a column
    spark.createDataFrame(
        [(2, "b", 42)], "id long, title string, likes long"
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", True).parquet(path)
    assert set(merged.columns) == {"id", "title", "likes"}
    by_id = {r.id: r for r in merged.collect()}
    assert by_id[1].likes is None  # old files: NULL-filled
    assert by_id[2].likes == 42

    # stable downstream contract independent of which file wins the footer
    stable = spark.read.schema("id long, title string, likes long").parquet(path)
    assert stable.where(F.col("likes").isNotNull()).count() == 1

    # without mergeSchema, parquet picks one footer — the new column may be
    # silently absent; pin the contract explicitly in production reads
    plain = spark.read.parquet(path)
    assert set(plain.columns).issubset({"id", "title", "likes"})
