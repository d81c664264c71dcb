"""ORC source/sink: the second columnar format Spark ships natively
(vectorized reader + predicate pushdown like Parquet).  The engine's
tables are Parquet-first, but a complete source surface (SURVEY §2.1)
reads whatever columnar files a user already has — verify round-trip
fidelity, column pruning, and pushdown reach the ORC scan too."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_orc_roundtrip_and_pushdown(spark, tmp_path, sf_dir):
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_orc")
    src.write.orc(path)

    back = spark.read.orc(path)
    assert back.schema == src.schema
    assert back.count() == src.count()

    # values survive the round trip bit-exactly (doubles included)
    a = sorted(map(tuple, src.limit(50).collect()))
    b = sorted(
        map(tuple, back.where(F.col("o_orderkey").isin([r[0] for r in a])).collect())
    )
    assert a == b

    # filter + projection reach the ORC scan like they do for Parquet
    plan = (
        back.where(F.col("o_custkey") == 7)
        .select("o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_custkey" in plan.split("PushedFilters")[1]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_totalprice" not in read_schema  # pruned
