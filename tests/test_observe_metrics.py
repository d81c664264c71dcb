"""df.observe(): named accumulator metrics evaluated during a real
action — how a production pipeline audits row counts / null rates /
value bounds in the SAME pass that writes the data, instead of paying a
second scan for a count().  (The reference's row-count existence probes
— SURVEY §2.1 S8/S9 — become free observations on the write job.)"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F


def test_observe_counts_during_write(spark, sf_dir, tmp_path):
    obs = Observation("ingest_audit")
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
                "n_nonpositive"
            ),
            F.max("o_orderdate").alias("max_date"),
        )
        .where(F.col("o_orderpriority") == "1-URGENT")
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "out"))

    got = obs.get
    # observation sees pre-filter rows: it's attached above the filter
    assert got["n_rows"] == spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert got["n_nonpositive"] == 0
    assert got["max_date"] is not None
