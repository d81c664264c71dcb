"""Catalog extensions, round 6 continuation: evaluation statistics and
graph/structure analysis for training-data curation —

* k-core extraction over a mutual-kNN embedding graph (manifold core
  vs periphery — the structural outlier filter SemDeDup-style pipelines
  run before clustering);
* unbiased pass@k estimation (Chen et al. 2021, HumanEval) with exact
  binomial integer arithmetic;
* nucleus (top-p) cutoff audit over an n-gram next-token distribution
  (how concentrated is the corpus' continuation mass per context).

Same doctrine as the sibling catalog modules: exact-integer outputs,
bit-exact DuckDB oracle replays (unrolled CTE rounds for the iterative
peel), plans that survive 100 TB — bounded candidate generation,
windowed reductions, no driver loops, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from youtube_trending_data_pipeline_spark.catalog import register, t

# ---------------------------------------------------------------------------
# k-core of the mutual-kNN embedding graph
# ---------------------------------------------------------------------------

_KNN_K = 5          # neighbors per vector (quantized-dot, ties by id)
_CORE_K = 3         # peel threshold
_PEEL_ROUNDS = 16   # fixpoint at sf0.01 is round 10; monotone no-op after

_QV_SQL = (
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000"
    " + 0.5) AS BIGINT))"
)
_QV_SPARK = (
    "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000"
    " + 0.5) AS BIGINT))"
)


def _kcore_oracle() -> str:
    """Unrolled replay: exact mutual-kNN build + _PEEL_ROUNDS peel rounds.

    Every round CTE is MATERIALIZED: each round references the previous
    one three times (degree filter + two survivor joins), so DuckDB's
    default CTE inlining would expand the plan 3^rounds-fold."""
    steps = []
    for i in range(1, _PEEL_ROUNDS + 1):
        steps.append(f"""
    s{i} AS MATERIALIZED (
      SELECT src AS node FROM e{i - 1} GROUP BY 1 HAVING COUNT(*) >= {_CORE_K}
    ),
    e{i} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e{i - 1} e
      JOIN s{i} a ON e.src = a.node JOIN s{i} b ON e.dst = b.node
    )""")
    return f"""
    WITH q AS MATERIALIZED (
      SELECT vec_id, {_QV_SQL} AS qv FROM embeddings
    ), scored AS (
      SELECT a.vec_id AS u, b.vec_id AS v,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
               ORDER BY list_sum(list_transform(range(1, 65),
                                 i -> a.qv[i] * b.qv[i])) DESC,
                        b.vec_id) AS rn
      FROM q a JOIN q b ON a.vec_id <> b.vec_id
    ), knn AS MATERIALIZED (SELECT u, v FROM scored WHERE rn <= {_KNN_K}),
    e0 AS MATERIALIZED (
      SELECT a.u AS src, a.v AS dst
      FROM knn a JOIN knn b ON a.u = b.v AND a.v = b.u
    ),
    {','.join(steps)}
    SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS core_deg
    FROM e{_PEEL_ROUNDS} GROUP BY 1
    """


@register(
    "graph_kcore_mutual_knn",
    _kcore_oracle(),
    "k-core extraction (Seidman 1983) over the MUTUAL-kNN embedding "
    "graph: each vector links to its 5 nearest neighbors by exact "
    "quantized-integer dot product (the embedding_quantize_int8 "
    "fixed-point scheme, so the ranking is bit-exact across engines), "
    "an edge survives only if it is reciprocal, and the 3-core is "
    "peeled out by fixed synchronous rounds — removing the manifold "
    "PERIPHERY (vectors nobody links back to) from the dense CORE, "
    "the structural outlier filter curation pipelines run before "
    "semantic clustering. Fixed-round peel + unrolled-CTE oracle is "
    "the pagerank/LPA doctrine: peeling is monotone, so the 6 rounds "
    "of headroom past the measured sf0.01 fixpoint (round 10) are "
    "no-ops, and the whole operator is a pure function of the data. "
    "At 100 TB the quadratic exact-kNN build swaps for the engine's "
    "LSH/IVF candidate generation (sim_lsh_topk / sim_ivf_pivot_topk) "
    "feeding the SAME mutual filter and peel; per peel round: one "
    "degree aggregate + two semi-joins, edge-side shuffle-free under "
    "src bucketing (tests/test_bucketing.py).",
)
def graph_kcore_mutual_knn(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.operators.graph import kcore_peel

    q = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(_QV_SPARK).alias("qv"),
    )
    a, b = q.alias("a"), q.alias("b")
    scored = (
        a.join(
            F.broadcast(b), F.col("a.vec_id") != F.col("b.vec_id")
        )
        .select(
            F.col("a.vec_id").alias("u"),
            F.col("b.vec_id").alias("v"),
            F.aggregate(
                F.zip_with(
                    F.col("a.qv"), F.col("b.qv"), lambda x, y: x * y
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dot"),
        )
    )
    wk = W.partitionBy("u").orderBy(F.desc("dot"), F.asc("v"))
    knn = (
        scored.withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= _KNN_K)
        .select("u", "v")
    )
    rev = knn.select(F.col("v").alias("ru"), F.col("u").alias("rv"))
    mutual = knn.join(
        rev,
        (knn["u"] == rev["ru"]) & (knn["v"] == rev["rv"]),
        "left_semi",
    ).select(F.col("u").alias("src"), F.col("v").alias("dst"))
    return kcore_peel(mutual, k=_CORE_K, rounds=_PEEL_ROUNDS)


# ---------------------------------------------------------------------------
# Unbiased pass@k estimator
# ---------------------------------------------------------------------------

_PASS_MAX_TRIALS = 20
_PASS_KS = (1, 5, 10)


def _binom_prod(n_expr: str, k: int) -> str:
    """C(n, k) as a literal falling-factorial product over k!.

    Exact in int64: the k-term product of consecutive integers is
    divisible by k! (it IS k! * C(n,k)), and with n <= 20, k <= 10 the
    intermediate tops out at 20!/10! ~ 6.7e11. For n < k one factor is
    exactly zero, so C(n,k) = 0 falls out with no branch. Same string
    is valid Spark SQL and DuckDB SQL (integer `//` spelled as div/CAST
    by the caller)."""
    import math

    prod = " * ".join(f"(({n_expr}) - {i})" for i in range(k))
    return f"(({prod}) DIV {math.factorial(k)})"


def _pass_at_k_sql() -> str:
    arms = []
    for k in _PASS_KS:
        den = _binom_prod("n_trials", k)
        miss = _binom_prod("n_trials - n_pass", k)
        arms.append(f"""
      SELECT user_id, CAST({k} AS BIGINT) AS k, n_trials, n_pass,
             CAST({den} - {miss} AS BIGINT) AS pass_num,
             CAST({den} AS BIGINT) AS pass_den,
             CAST((1000000 * ({den} - {miss})) // {den} AS BIGINT)
               AS pass_ppm
      FROM agg WHERE n_trials >= {k}""")
    body = "\n      UNION ALL\n".join(arms)
    return f"""
    WITH ranked AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_ns(ts), event_id) AS rn
      FROM events
    ), agg AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_trials,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pass
      FROM ranked WHERE rn <= {_PASS_MAX_TRIALS}
      GROUP BY user_id
    )
    {body}
    """.replace(" DIV ", " // ")


@register(
    "eval_pass_at_k",
    _pass_at_k_sql(),
    "Unbiased pass@k estimator (Chen et al. 2021, the HumanEval "
    "codegen metric): per task (user), take the first n <= 20 samples "
    "(events, first-seen order), count passes (purchases), and report "
    "pass@k = 1 - C(n-c,k)/C(n,k) for k in {1,5,10} as EXACT integer "
    "numerator/denominator plus a ppm rendering — the naive c/n "
    "estimator is biased for k > 1; this combinatorial form is the "
    "published fix, and falling-factorial products over k! keep every "
    "intermediate in int64 so both engines agree bit-for-bit. One "
    "window + one aggregate + a 3-arm constant fan-out: the per-task "
    "cap bounds the combinatorics AND the window state at 100 TB "
    "(rank-then-filter pushes the cap map-side under AQE).",
)
def eval_pass_at_k(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    wr = W.partitionBy("user_id").orderBy("ts", "event_id")
    agg = (
        ev.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") <= _PASS_MAX_TRIALS)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trials"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("long")
            .alias("n_pass"),
        )
    )
    arms = []
    for k in _PASS_KS:
        den = _binom_prod("n_trials", k)
        miss = _binom_prod("n_trials - n_pass", k)
        arms.append(
            agg.where(F.col("n_trials") >= k).select(
                "user_id",
                F.lit(k).cast("long").alias("k"),
                "n_trials",
                "n_pass",
                F.expr(f"CAST({den} - {miss} AS BIGINT)").alias("pass_num"),
                F.expr(f"CAST({den} AS BIGINT)").alias("pass_den"),
                F.expr(
                    f"CAST((1000000 * ({den} - {miss})) DIV {den} AS BIGINT)"
                ).alias("pass_ppm"),
            )
        )
    out = arms[0]
    for arm in arms[1:]:
        out = out.unionAll(arm)
    return out


# ---------------------------------------------------------------------------
# Nucleus (top-p) cutoff audit over bigram continuations
# ---------------------------------------------------------------------------

_TOKS_SQL = "list_filter(string_split(lower(text), ' '), x -> x <> '')"
_NUCLEUS_P_PCT = 90
_NUCLEUS_MIN_TOTAL = 5


@register(
    "ngram_nucleus_cutoff",
    f"""
    WITH tk AS (
      SELECT {_TOKS_SQL} AS toks FROM documents
    ), bg AS (
      SELECT unnest(list_transform(range(1, len(toks)),
             i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS b
      FROM tk WHERE len(toks) >= 2
    ), cnt AS (
      SELECT b.w1 AS context, b.w2 AS nxt,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM bg GROUP BY 1, 2
    ), cum AS (
      SELECT context, nxt, c,
             SUM(c) OVER (PARTITION BY context) AS total,
             SUM(c) OVER (PARTITION BY context
                          ORDER BY c DESC, nxt
                          ROWS UNBOUNDED PRECEDING) AS run,
             ROW_NUMBER() OVER (PARTITION BY context
                                ORDER BY c DESC, nxt) AS rn
      FROM cnt
    )
    SELECT context,
           CAST(MAX(total) AS BIGINT) AS total_cnt,
           CAST(COUNT(*) AS BIGINT) AS vocab_next,
           CAST(SUM(CASE WHEN 100 * (run - c)
                         < {_NUCLEUS_P_PCT} * total THEN 1 ELSE 0 END)
                AS BIGINT) AS nucleus_size,
           MAX(CASE WHEN rn = 1 THEN nxt END) AS top_next
    FROM cum
    GROUP BY context
    HAVING MAX(total) >= {_NUCLEUS_MIN_TOTAL}
    """,
    "Nucleus (top-p) cutoff audit (Holtzman et al. 2020) over the "
    "corpus bigram next-token distribution: per context token, rank "
    "continuations by frequency (ties lexicographic), and report how "
    "many tokens the p=0.9 nucleus needs — the smallest prefix whose "
    "cumulative mass reaches 90% — plus total mass, branching factor, "
    "and the argmax continuation. The all-integer cumulative test "
    "(100*(run-c) < 90*total counts tokens whose PRECEDING mass is "
    "still short of the threshold) avoids any float probability, so "
    "the oracle replays it bit-for-bit. Shape: one explode + one "
    "(context,next) count + one windowed reduction per context — "
    "vocab-bounded state, no joins; exactly the concentration audit "
    "run before choosing decoding/filter thresholds on corpus-derived "
    "LMs.",
)
def ngram_nucleus_cutoff(spark, sf_dir):
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    docs = t(spark, sf_dir, "documents").select(toks.alias("toks"))
    bg = (
        docs.where(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(toks[i - 1] AS w1, toks[i] AS w2))"
                )
            ).alias("b")
        )
        .select(F.col("b.w1").alias("context"), F.col("b.w2").alias("nxt"))
    )
    cnt = bg.groupBy("context", "nxt").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wt = W.partitionBy("context")
    wo = W.partitionBy("context").orderBy(F.desc("c"), F.asc("nxt"))
    cum = cnt.select(
        "context",
        "nxt",
        "c",
        F.sum("c").over(wt).alias("total"),
        F.sum("c").over(wo.rowsBetween(W.unboundedPreceding, 0)).alias("run"),
        F.row_number().over(wo).alias("rn"),
    )
    return (
        cum.groupBy("context")
        .agg(
            F.max("total").cast("long").alias("total_cnt"),
            F.count(F.lit(1)).cast("long").alias("vocab_next"),
            F.sum(
                F.when(
                    100 * (F.col("run") - F.col("c"))
                    < _NUCLEUS_P_PCT * F.col("total"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("nucleus_size"),
            F.max(F.when(F.col("rn") == 1, F.col("nxt"))).alias("top_next"),
        )
        .where(F.col("total_cnt") >= _NUCLEUS_MIN_TOTAL)
    )
