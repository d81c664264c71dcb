"""Full-catalog sweep on a VANILLA SparkSession (none of our session
confs — the same environment the external driver uses), at any SF dir.

For every registry entry: run the Spark query; if it has an oracle, run
the DuckDB SQL too and compare through PANDAS frames with the shared
driver-faithful comparator (column names + row count + numeric dtype
drift + type-tagged value multiset; see
``youtube_trending_data_pipeline_spark.parity``) — the old DB-API
``fetchall`` comparison could not see DuckDB HUGEINT → float64 pandas
promotion (CORRECTNESS_r09's two hash-fails were sweep-green).  Entries
whose ORACLE is known super-linear at large SF (DuckDB recursive
transitive closures — the Spark side is fine) fall back to rows-only.
Prints one JSON line per entry and a final summary line.

Usage: python sweep.py [sf_dir] [resume_file] [--only n1,n2,...]
(default sf_dir /root/testdata/sf0.1; with resume_file, entries already
recorded there are skipped and the new lines can be concatenated;
--only restricts to named entries AND overrides the big-SF ORACLE_HEAVY
skip — the caller is explicitly asking for the full oracle compare, the
round-12 100x-EXACT workflow)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# DuckDB-side quadratic/recursive oracles: compare only at sf<=0.01
ORACLE_HEAVY = {
    "dedup_components",
    "dedup_components_star",
    "dedup_keep_best",
    "dedup_ngram_jaccard",
    "dedup_levenshtein",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
    "dedup_minhash_jaccard_est",
    "dedup_shingle_containment",
    "dedup_simhash",
    "r1_recursive_spine",
    "contamination_check",
    # DuckDB-side iterative replays: the unrolled HITS CTE chain with
    # scalar-subquery maxes re-evaluates each round (~340 s at sf0.1;
    # Spark side is ~6 s), and the EWMA recursive CTE joins per event
    # rank. Both verified EXACT at sf0.1 once (2026-08-14 session);
    # routine big-SF sweeps skip the oracle side only.
    "graph_hits",
    "ewma_user_value",
    # same recursive-CTE replay shape as ewma_user_value, with two
    # carried registers
    "holt_linear_fold",
    # round-10 second session: the FFD oracle is a recursive CTE
    # carrying bin-fill lists (one row per (shard, step)), the split
    # oracle embeds the components closure, and the recall audit's
    # ground truth is a shingle-posting self-join — all sf<=0.01 class
    "pack_sequences_ffd",
    "split_leakage_free_components",
    "dedup_minhash_recall_audit",
    # the sampled form bounds the SPARK-side ground truth, but its
    # DuckDB oracle still replays the full-corpus LSH pipeline (the
    # audited subject) — big-SF sweeps skip the oracle side only
    "dedup_minhash_recall_audit_sampled",
    # composes the full LSH replay into a recursive-CTE closure
    "dedup_components_lsh",
    # same closure composition plus the split projection (round 12)
    "split_leakage_free_lsh",
}


def main() -> None:
    argv = list(sys.argv[1:])
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    mem = None
    if "--mem" in argv:
        # big-SF 100x-EXACT runs need a real heap (the iterative graph
        # family OOMs the 1g vanilla default); the DRIVER-faithful part
        # is the comparator, not the heap size, so this stays opt-in and
        # the default session remains exactly what the driver builds
        i = argv.index("--mem")
        mem = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    big_sf = not sf_dir.rstrip("/").endswith(("sf0.001", "sf0.01"))

    import duckdb
    from pyspark.sql import SparkSession

    from youtube_trending_data_pipeline_spark.parity import compare_frames

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
        if mem is None
        else SparkSession.builder.master("local[32]")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", mem)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    con = duckdb.connect()
    for tb in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"create view {tb} as select * from '{sf_dir}/{tb}.parquet'")

    # generated oracles (embedding_pca_project) embed data-dependent
    # literals; point them at the swept SF so both sides read one dataset
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    # materialize generated oracles LAZILY per entry: a generator whose
    # own scale guard fires at the swept SF (token_huffman_code_audit's
    # vocab cap at the 100x replica) must fail only ITS row, not the
    # whole sweep (round 12)
    from youtube_trending_data_pipeline_spark.catalog import QUERIES

    qs = entry.queries()

    class _LazyOracles:
        def __contains__(self, name):
            spec = QUERIES.get(name)
            return spec is not None and spec.oracle is not None

        def __getitem__(self, name):
            o = QUERIES[name].oracle
            return o() if callable(o) else o

    oracles = _LazyOracles()
    done: set[str] = set()
    if len(argv) > 1 and os.path.exists(argv[1]):
        with open(argv[1]) as fh:
            done = {
                json.loads(line).get("q")
                for line in fh
                if line.strip() and '"q"' in line
            }
    exact = rows_only = failed = 0
    for name in qs:
        if name in done or (only is not None and name not in only):
            continue
        t0 = time.perf_counter()
        rec = {"q": name}
        try:
            df = qs[name](spark, sf_dir)
            if name in oracles and (
                only is not None or not (big_sf and name in ORACLE_HEAVY)
            ):
                spdf = df.toPandas()
                rec["rows"] = len(spdf)
                dpdf = con.execute(oracles[name]).df()
                problems = compare_frames(spdf, dpdf)
                rec["match"] = not problems
                if problems:
                    rec["why"] = "; ".join(problems)[:300]
                    failed += 1
                else:
                    exact += 1
            else:
                rec["rows"] = df.count()
                rec["match"] = None
                rows_only += 1
        except Exception as e:  # noqa: BLE001 - sweep must report, not die
            rec["err"] = str(e)[:200]
            failed += 1
        rec["sec"] = round(time.perf_counter() - t0, 2)
        print(json.dumps(rec), flush=True)
    print(
        json.dumps(
            {
                "summary": True,
                "sf_dir": sf_dir,
                "total": len(only) if only is not None else len(qs),
                "exact": exact,
                "rows_only": rows_only,
                "failed": failed,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
