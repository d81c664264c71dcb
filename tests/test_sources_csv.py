"""CSV source/sink: schema'd read (no inference job at scale), header
round-trip, and malformed-row handling — the same bronze-robustness
policy as the JSON path (SURVEY §2.1; corrupt-record handling mirrors
tests/test_extensions.py's JSON strict/permissive split)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ]
)


def test_csv_roundtrip_with_schema(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b,with,commas", 2.5), (3, None, None)], SCHEMA
    )
    path = str(tmp_path / "csv")
    df.write.option("header", True).csv(path)

    back = spark.read.schema(SCHEMA).option("header", True).csv(path)
    assert back.schema == SCHEMA  # explicit schema: no inference scan
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_csv_permissive_captures_malformed(spark, tmp_path):
    raw = tmp_path / "raw.csv"
    raw.write_text("id,name,score\n1,ok,1.0\nnot_a_number,bad,x\n2,ok2,2.0\n")
    schema_with_corrupt = SCHEMA.add("_corrupt_record", StringType())
    df = (
        spark.read.schema(schema_with_corrupt)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(raw))
        .cache()  # corrupt-record column requires a materialized referenced row
    )
    good = df.where(F.col("_corrupt_record").isNull())
    bad = df.where(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    assert "not_a_number" in bad.collect()[0]["_corrupt_record"]


def test_csv_failfast_raises(spark, tmp_path):
    raw = tmp_path / "raw.csv"
    raw.write_text("id,name,score\n1,ok,1.0\nnot_a_number,bad,x\n")
    import pytest

    with pytest.raises(Exception) as exc:
        spark.read.schema(SCHEMA).option("header", True).option(
            "mode", "FAILFAST"
        ).csv(str(raw)).collect()
    assert "Malformed" in str(exc.value) or "FAILFAST" in str(exc.value)
