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
# Measured fixpoints on the bucketed build: round 12 (sf0.001), 7 (sf0.01),
# 17 (sf0.1); peeling is monotone, so the headroom rounds are no-ops.
_PEEL_ROUNDS = 20
# IVF pivot cells for the bucketed candidate build are CORPUS-RELATIVE
# (round 8, the apriori ppm doctrine applied to the cell knob): the
# within-cell matmul is quadratic in cell size, so a fixed cell count
# grows super-linear with the corpus — n_cells = GREATEST(8, n // 250)
# holds expected cell size at ~250 vectors. The rule reproduces the old
# fixed 8 cells at every gate SF (2 k vectors at sf0.1 -> 2000//250 =
# 8), and gives 80 at the 10x replica — the exact "cells scaled 10x"
# configuration scripts/mutual_knn_scale.py measured at 4.6x/10x in r7.
# Both engines derive it from COUNT(*), so the oracle replays it.
_MKNN_CELLS_MIN = 8
_MKNN_CELL_SIZE = 250
_MKNN_PROBE = 5     # probe FLOOR (multi-probe recall knob; see _mknn_knobs)
# Each vector is a MEMBER of its top-member cells (multi-assignment):
# with single assignment the candidate relation is asymmetric (u sees v
# but v never sees u), which systematically destroys MUTUAL edges —
# measured recall jumps 0.69 -> 0.95 at sf0.01 going (probe=5,
# member=1) -> (probe=5, member=2) on the near-random synthetic
# embeddings (the adversarial case for any ANN bucketing).
_MKNN_MEMBER = 2    # member FLOOR (see _mknn_knobs)


def _mknn_knobs(n_cells: int) -> tuple[int, int]:
    """Corpus-relative (probe, member) schedule — round 9, closing the
    recall dial the round-8 corpus-relative CELL knob opened.

    Scaling cells alone (n_cells = n/250) drops the per-vector probed
    fraction ~1/cells, and MEASURED recall vs the exact build collapsed
    at the 10x replica (20 k vectors, 80 cells): 0.95 -> 0.335 on the
    near-random testdata embeddings and 0.95 -> 0.406 on a
    deterministic mixture-of-Gaussians CLUSTERED fixture
    (scripts/mutual_knn_clustered_recall.py — the r8 verdict asked for
    the clustered number instead of the asserted 'clustered corpora
    hold recall', and it does NOT hold: pivots inside a tight cluster
    are interchangeable, so per-vector pivot ranking is noise-driven
    and near neighbors land in different cells).

    The schedule holds the probe count at its gate-scale RATIO to
    sqrt(cells) — probe = ceil(sqrt(25 * cells / 8)) — and the member
    count at ceil(probe / 5); at the gate cell floor (8 cells) this
    reproduces (5, 2) bit-for-bit (all three gate SFs have <= 2000
    vectors -> 8 cells), so gate results are unchanged, and at the 10x
    replica (80 cells -> probe 16, member 4) MEASURED recall returns to
    0.938 (clustered) / 0.914 (random) at 18.6 s / 14.9 s vs the exact
    build's ~40 s (numbers in PERF.md round 9; Lloyd-refined cells were
    measured too and lose on both axes: 0.61-0.69 recall at ~43 s).
    Honest cost: member ~ probe/5 keeps the scored candidate fraction
    ~constant (~probe*member*250/n ~ 5/8), so holding THIS recall on
    structure-free embeddings costs a constant fraction of all-pairs —
    that is the information-theoretic price of 0.9+ recall on k-NN
    graphs over near-random vectors, paid within cells and cheaper
    than brute force by the constant, never by asymptotics. Corpora
    whose neighbors concentrate in few cells can lower the schedule;
    graph_mutual_knn_recall_audit stays the in-gate regression signal.

    Both engines derive the same numbers: this helper on the Spark
    side (driver-side ints from one bounded count), the nc CTE in
    _mutual_cte_sql on the oracle side (CEIL/SQRT on doubles is
    correctly rounded IEEE in both engines; ceil(p/5) is spelled
    (p + 4) // 5 so it stays pure-integer)."""
    import math

    probe = max(_MKNN_PROBE, math.ceil(math.sqrt(25 * n_cells / 8)))
    member = max(_MKNN_MEMBER, (probe + 4) // 5)
    return probe, member

_QV_SQL = (
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000"
    " + 0.5) AS BIGINT))"
)
_QV_SPARK = (
    "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000"
    " + 0.5) AS BIGINT))"
)


def _rowwise_topk(D, ids, k):
    """Per-row top-k COLUMN indices of D by (value DESC, ids ASC),
    fully vectorized — the per-row ``np.lexsort`` loop this replaces
    was the sf1 bottleneck of the exact kNN kernel (the 20 k-row loop
    cost ~6 min; this is two argpartition/argsort passes).

    The composite order is encoded into one int64 key per cell:
    ``value * M - rank(id)`` with M the next power of two above the
    column count, so a larger value always wins and the smaller id
    wins among equals. Falls back to the per-row lexsort when the
    encoding could overflow int64 (never at these magnitudes — dots
    are <= ~6e9 and M <= 2^21 for any corpus this kernel sees)."""
    import numpy as np

    m, n = D.shape
    k = min(k, n)
    if k <= 0 or n == 0:
        return np.empty((m, 0), dtype=np.int64)
    order_ids = np.argsort(ids, kind="stable")
    rank = np.empty(n, dtype=np.int64)
    rank[order_ids] = np.arange(n, dtype=np.int64)
    M = np.int64(1) << int(max(n - 1, 1)).bit_length()
    # guard computed in float: the int64 product itself could overflow
    if float(np.abs(D).max(initial=0)) * float(M) > float(1 << 62):
        out = np.empty((m, k), dtype=np.int64)
        for r in range(m):
            out[r] = np.lexsort((ids, -D[r]))[:k]
        return out
    key = D * M - rank[None, :]
    part = np.argpartition(-key, k - 1, axis=1)[:, :k]
    rowkeys = np.take_along_axis(-key, part, axis=1)
    order = np.argsort(rowkeys, axis=1, kind="stable")
    return np.take_along_axis(part, order, axis=1)


# Masks self-pairs so they sort LAST under (dot DESC, id ASC): smaller
# than any legitimate dot (those are >= -6.4e9) yet small enough in
# magnitude that _rowwise_topk's key encoding never overflows (the old
# int64.min // 2 sentinel would).
_SELF_MASK = -(1 << 40)


def _exact_int_matmul(A, B):
    """EXACT integer dot products via a float64 BLAS matmul.

    numpy's int64 @ has no BLAS kernel (it is a naive triple loop —
    measured ~380 s for the 20 k x 20 k sf1 exact build); float64 DOES.
    The result is still exact integers provided every product and every
    partial sum is <= 2^53: quantized coordinates are |x| <= ~10^5
    (embedding values ~[-1, 1] at scale 10^4), so a 64-term dot tops
    out near 64 * 10^10 ~ 6e11, four orders of magnitude under the
    float64 integer ceiling. The guard enforces the precondition loudly
    rather than ever returning a silently rounded dot: an int64 matmul
    fallback would itself wrap silently once bound^2*dim > 2^63, so
    out-of-range inputs raise instead of risking a wrong answer."""
    import numpy as np

    bound = np.float64(max(np.abs(A).max(initial=0), np.abs(B).max(initial=0)))
    if bound * bound * A.shape[1] > 2**53:
        raise ValueError(
            "quantized embedding magnitude %s exceeds the exact-dot "
            "precondition bound^2*dim <= 2^53; re-quantize at a lower "
            "scale" % bound
        )
    return np.rint(
        A.astype(np.float64) @ B.astype(np.float64).T
    ).astype(np.int64)


def _knn_schema():
    from pyspark.sql.types import LongType, StructField, StructType

    return StructType(
        [
            StructField("u", LongType()),
            StructField("v", LongType()),
            StructField("dot", LongType()),
        ]
    )


def _knn_cell_kernel(pdf, k):
    """Shared applyInPandas kernel for both mutual-kNN builds: score
    every PROBER row (is_p) against every MEMBER row (is_m) of its
    group with one exact integer matmul, mask self-pairs, and keep each
    prober's top-k by (dot DESC, member id ASC) — fully vectorized
    (_exact_int_matmul + _rowwise_topk; the per-row lexsort loop this
    replaces cost minutes at sf1)."""
    import numpy as np
    import pandas as pd

    mem = pdf[pdf["is_m"]]
    pro = pdf[pdf["is_p"]]
    if not len(mem) or not len(pro):
        return pd.DataFrame(
            {"u": pd.Series(dtype="int64"),
             "v": pd.Series(dtype="int64"),
             "dot": pd.Series(dtype="int64")}
        )
    mids = mem["vec_id"].to_numpy(dtype=np.int64)
    M = np.array(list(mem["qv"]), dtype=np.int64)
    pids = pro["vec_id"].to_numpy(dtype=np.int64)
    P = np.array(list(pro["qv"]), dtype=np.int64)
    D = _exact_int_matmul(P, M)  # probers x members
    D[pids[:, None] == mids[None, :]] = _SELF_MASK
    cols = _rowwise_topk(D, mids, k)
    dots = np.take_along_axis(D, cols, axis=1).ravel()
    keep = dots != _SELF_MASK
    return pd.DataFrame(
        {"u": np.repeat(pids, cols.shape[1])[keep],
         "v": mids[cols.ravel()][keep],
         "dot": dots[keep]}
    )


_EXACT_SALTS = 32  # parallelism of the exact build; result-invariant


def _mutual_knn_edges_exact(spark, sf_dir):
    """EXACT all-pairs mutual-kNN edge list — the labeled correctness
    baseline (the sim_bruteforce_topk doctrine), kept ONLY to audit the
    bucketed production build's recall (graph_mutual_knn_recall_audit).
    The graph-structure entries themselves run on the bounded
    _mutual_knn_edges candidate build below.

    Shape (round 7): probers hash into _EXACT_SALTS groups and the
    member corpus is replicated once per group via a 32-row broadcast
    spine, so the Arrow transfer is O(32 n) rows — the previous 1-row
    corpus block crossJoined onto EVERY row shipped O(n) copies of the
    whole corpus (measured 764 s at sf1, ~all serialization). Each
    group runs the shared _knn_cell_kernel (float64-BLAS exact integer
    matmul + vectorized top-k); since members = the whole corpus, the
    per-group top-k IS the exact global top-k, and the mutual
    semi-join filter follows. Quadratic compute by definition: fine as
    an audit at bench scale, never the 100 TB path."""
    q = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(_QV_SPARK).alias("qv"),
    )
    salts = F.broadcast(
        spark.range(_EXACT_SALTS).select(F.col("id").cast("int").alias("cell"))
    )
    probers = q.select(
        (F.col("vec_id") % _EXACT_SALTS).cast("int").alias("cell"),
        "vec_id",
        "qv",
        F.lit(False).alias("is_m"),
        F.lit(True).alias("is_p"),
    )
    members = q.crossJoin(salts).select(
        "cell",
        "vec_id",
        "qv",
        F.lit(True).alias("is_m"),
        F.lit(False).alias("is_p"),
    )
    knn = (
        probers.unionByName(members)
        .groupBy("cell")
        .applyInPandas(
            lambda pdf: _knn_cell_kernel(pdf, _KNN_K), schema=_knn_schema()
        )
        .select("u", "v")
    )
    rev = knn.select(F.col("v").alias("ru"), F.col("u").alias("rv"))
    return knn.join(
        rev,
        (knn["u"] == rev["ru"]) & (knn["v"] == rev["rv"]),
        "left_semi",
    ).select(F.col("u").alias("src"), F.col("v").alias("dst"))


def _mutual_knn_scored(spark, sf_dir):
    """Deduped scored candidate pairs (u, v, dot) of the BOUNDED
    mutual-kNN candidate generation — the stage _mutual_knn_edges
    ranks and mutual-filters (split out in round 8 so margin mining,
    catalog_quality.sim_margin_topk, reuses the candidate build) — the
    production build the graph-structure entries run on (kcore / ktruss
    / rich-club), replacing the round-6 all-pairs block (kept as
    _mutual_knn_edges_exact for the recall audit only).

    IVF-pivot architecture (the sim_ivf_pivot_topk doctrine, so the
    whole build is a pure function of the data — deterministic across
    engines, partitionings, and reruns):

    * the first GREATEST(_MKNN_CELLS_MIN, n // _MKNN_CELL_SIZE) corpus
      vectors by id are the pivot cells (corpus-relative, round 8 —
      see the knob comment above);
    * every vector ranks the pivots by exact quantized int64 dot
      (ties to the smaller pivot id): ranks 1..member are its
      MEMBER cells (multi-assignment — keeps the candidate relation
      near-symmetric, which mutual filtering needs; see the knob
      comment above), ranks 1..probe its PROBED cells (multi-probe —
      the recall knob); probe and member are CORPUS-RELATIVE since
      round 9 (_mknn_knobs: probe ~ sqrt(cells), member ~ probe/5 —
      reproduces (5, 2) at the 8-cell gate floor, holds measured
      recall ~0.92-0.94 at the 10x replica's 80 cells);
    * candidates for u = members of u's probed cells; a (u, v) pair
      can surface in up to `member` cells with the SAME exact dot,
      so one distinct() collapses the duplicates;
    * per cell, one applyInPandas numpy int64 matmul scores probers
      against members (the semdedup within-cell BLAS doctrine) and
      keeps each prober's per-cell top-_KNN_K by (-dot, neighbor id);
    * a global per-u window reduces the <= probe * _KNN_K
      survivors to the true candidate top-_KNN_K (top-k of a union is
      the top-k of the per-group top-ks), and the mutual semi-join
      filter is unchanged from the exact build.

    Scale shape: pivot ranking is an 8-row broadcast constant-append;
    the per-cell matmul is quadratic WITHIN cells only, so n_cells
    scales with the corpus exactly like semdedup_keepers' measured
    knob (scripts/semdedup_scale.py); the shuffle moves only
    (u, v, dot) longs — vectors never travel past the cell stage."""
    q = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_QV_SPARK).alias("qv")
    )
    # corpus-relative cell count (see the knob comment above): one
    # bounded count() action so the seed take stays a
    # TakeOrderedAndProject (a dynamic LIMIT column would force a
    # global sort); the oracle derives the same number from COUNT(*).
    n_cells = max(
        _MKNN_CELLS_MIN,
        t(spark, sf_dir, "embeddings").count() // _MKNN_CELL_SIZE,
    )
    # corpus-relative probe/member schedule (round 9): reproduces
    # (5, 2) at the 8-cell gate floor, scales with sqrt(cells) past it
    # — see _mknn_knobs for the measured recall/cost trade.
    probe, member = _mknn_knobs(n_cells)
    seeds = F.broadcast(
        q.orderBy("vec_id")
        .limit(n_cells)
        .select(
            F.col("vec_id").alias("seed_id"), F.col("qv").alias("seed_qv")
        )
    )
    w_cell = W.partitionBy("vec_id").orderBy(
        F.desc("cdot"), F.asc("seed_id")
    )
    tagged = (
        q.crossJoin(seeds)
        .withColumn(
            "cdot",
            F.expr(
                "aggregate(zip_with(qv, seed_qv, (x, y) -> x * y),"
                " 0L, (a, x) -> a + x)"
            ),
        )
        .withColumn("cr", F.row_number().over(w_cell))
        .where(F.col("cr") <= probe)
        .select(
            F.col("seed_id").alias("cell"),
            "vec_id",
            "qv",
            (F.col("cr") <= member).alias("is_m"),
            F.lit(True).alias("is_p"),  # every kept row probes its cell
        )
    )
    return (
        tagged.groupBy("cell")
        .applyInPandas(
            lambda pdf: _knn_cell_kernel(pdf, _KNN_K), schema=_knn_schema()
        )
        # a (u, v) pair surfaces once per shared member cell with the
        # same exact dot — collapse before ranking so row_number never
        # spends top-k slots on duplicates
        .distinct()
    )


def _mutual_knn_edges(spark, sf_dir):
    """Mutual-kNN edge list: rank _mutual_knn_scored's candidate pairs
    per u (dot DESC, v ASC), keep top-_KNN_K, keep only reciprocal
    edges — the production build the graph-structure entries run on."""
    pairs = _mutual_knn_scored(spark, sf_dir)
    w_knn = W.partitionBy("u").orderBy(F.desc("dot"), F.asc("v"))
    knn = (
        pairs.withColumn("rn", F.row_number().over(w_knn))
        .where(F.col("rn") <= _KNN_K)
        .select("u", "v")
    )
    rev = knn.select(F.col("v").alias("ru"), F.col("u").alias("rv"))
    return knn.join(
        rev,
        (knn["u"] == rev["ru"]) & (knn["v"] == rev["rv"]),
        "left_semi",
    ).select(F.col("u").alias("src"), F.col("v").alias("dst"))


def _mutual_cte_sql(
    edge_name: str = "e0",
    canonical: bool = False,
    with_dots: bool = False,
) -> str:
    """CTE chain (sans leading WITH) replaying the BUCKETED mutual-kNN
    build bit-exactly: pivot ranking, multi-probe candidates, exact
    integer dot re-rank, mutual filter. Shared by the kcore / ktruss /
    rich-club oracles and the recall audit; ``with_dots`` keeps the dot
    value on the scored/knn CTEs (same ranking) for the margin-mining
    oracle (catalog_quality.sim_margin_topk)."""
    guard = "WHERE a.u < a.v" if canonical else ""
    if with_dots:
        scored = f"""scored AS (
      SELECT u, v, dot,
             ROW_NUMBER() OVER (PARTITION BY u
               ORDER BY dot DESC, v) AS rn
      FROM (
        SELECT c.u, c.v,
               list_sum(list_transform(range(1, 65),
                        i -> a.qv[i] * b.qv[i])) AS dot
        FROM cand c JOIN q a ON c.u = a.vec_id JOIN q b ON c.v = b.vec_id
      )
    ), knn AS MATERIALIZED (
      SELECT u, v, dot FROM scored WHERE rn <= {_KNN_K}),"""
    else:
        scored = f"""scored AS (
      SELECT c.u, c.v,
             ROW_NUMBER() OVER (PARTITION BY c.u
               ORDER BY list_sum(list_transform(range(1, 65),
                                 i -> a.qv[i] * b.qv[i])) DESC,
                        c.v) AS rn
      FROM cand c JOIN q a ON c.u = a.vec_id JOIN q b ON c.v = b.vec_id
    ), knn AS MATERIALIZED (SELECT u, v FROM scored WHERE rn <= {_KNN_K}),"""
    return f"""q AS MATERIALIZED (
      SELECT vec_id, {_QV_SQL} AS qv FROM embeddings
    ), nc AS MATERIALIZED (
      -- corpus-relative cells AND probe/member schedule (round 9):
      -- probe = ceil(sqrt(25 * cells / 8)) with floor {_MKNN_PROBE},
      -- member = ceil(probe / 5) as (probe + 4) // 5 with floor
      -- {_MKNN_MEMBER} — replays _mknn_knobs bit-for-bit (CEIL/SQRT on
      -- doubles is correctly-rounded IEEE in both engines)
      SELECT n_cells, probe,
             GREATEST({_MKNN_MEMBER}, (probe + 4) // 5) AS member
      FROM (
        SELECT n_cells,
               GREATEST({_MKNN_PROBE},
                        CAST(CEIL(SQRT(CAST(25 * n_cells AS DOUBLE) / 8))
                             AS BIGINT)) AS probe
        FROM (
          SELECT GREATEST({_MKNN_CELLS_MIN},
                          COUNT(*) // {_MKNN_CELL_SIZE}) AS n_cells
          FROM q
        )
      )
    ), seeds AS MATERIALIZED (
      SELECT vec_id AS seed_id, qv AS seed_qv FROM (
        SELECT vec_id, qv,
               ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
        FROM q
      ) r, nc WHERE r.rn <= nc.n_cells
    ), cellrank AS MATERIALIZED (
      SELECT a.vec_id, s.seed_id,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
               ORDER BY list_sum(list_transform(range(1, 65),
                                 i -> a.qv[i] * s.seed_qv[i])) DESC,
                        s.seed_id) AS cr
      FROM q a CROSS JOIN seeds s
    ), cand AS MATERIALIZED (
      SELECT DISTINCT p.vec_id AS u, m.vec_id AS v
      FROM cellrank p
      JOIN cellrank m ON p.seed_id = m.seed_id
      CROSS JOIN nc
      WHERE m.cr <= nc.member AND p.cr <= nc.probe
        AND p.vec_id <> m.vec_id
    ), {scored}
    {edge_name} AS MATERIALIZED (
      SELECT a.u AS src, a.v AS dst
      FROM knn a JOIN knn b ON a.u = b.v AND a.v = b.u
      {guard}
    )"""


def _kcore_oracle() -> str:
    """Unrolled replay: bucketed mutual-kNN build + _PEEL_ROUNDS peel
    rounds.

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
    WITH {_mutual_cte_sql("e0")},
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
    "the pagerank/LPA doctrine: peeling is monotone, so rounds past "
    "the measured fixpoint are no-ops, and the whole operator is a "
    "pure function of the data. Round 7: the kNN build is the BOUNDED "
    "IVF-pivot candidate generation (_mutual_knn_edges — "
    "deterministic pivot cells, 5-probe, 2-member multi-assignment, "
    "within-cell BLAS re-rank, measured recall 0.94-0.95 vs exact at "
    "the gate SFs); round 8 makes the cell count corpus-relative "
    "in-code (GREATEST(8, n // 250), oracle-replayed from COUNT(*)) "
    "so the within-cell quadratic never outgrows the corpus — the "
    "recall/cost dial this moves is measured and documented in "
    "PERF.md, and graph_mutual_knn_recall_audit is the in-gate "
    "regression signal for it. The retired quadratic build survives "
    "only as the recall audit's exact baseline. Per peel round: one "
    "degree aggregate + two semi-joins, edge-side shuffle-free under "
    "src bucketing (tests/test_bucketing.py).",
)
def graph_kcore_mutual_knn(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.operators.graph import kcore_peel

    mutual = _mutual_knn_edges(spark, sf_dir)
    return kcore_peel(mutual, k=_CORE_K, rounds=_PEEL_ROUNDS)


def _mutual_recall_oracle() -> str:
    return f"""
    WITH {_mutual_cte_sql("bmut", canonical=True)},
    exact_scored AS (
      SELECT a.vec_id AS u, b.vec_id AS v,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
               ORDER BY list_sum(list_transform(range(1, 65),
                                 i -> a.qv[i] * b.qv[i])) DESC,
                        b.vec_id) AS rn
      FROM q a JOIN q b ON a.vec_id <> b.vec_id
    ), eknn AS MATERIALIZED (
      SELECT u, v FROM exact_scored WHERE rn <= {_KNN_K}
    ), emut AS MATERIALIZED (
      SELECT a.u AS src, a.v AS dst
      FROM eknn a JOIN eknn b ON a.u = b.v AND a.v = b.u
      WHERE a.u < a.v
    ), counts AS (
      SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM emut) AS exact_edges,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM bmut) AS bucketed_edges,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM emut e
          JOIN bmut b ON e.src = b.src AND e.dst = b.dst) AS common_edges
    )
    SELECT exact_edges, bucketed_edges, common_edges,
           CAST((1000000 * common_edges)
                // GREATEST(exact_edges, 1) AS BIGINT) AS recall_ppm
    FROM counts
    """


@register(
    "graph_mutual_knn_recall_audit",
    _mutual_recall_oracle(),
    "Recall audit of the BUCKETED mutual-kNN build the graph-structure "
    "entries (kcore / ktruss / rich-club) run on, against the retired "
    "all-pairs exact build — the sim_pq_recall_audit doctrine applied "
    "to graph construction: canonical (src < dst) mutual edges from "
    "both builds, edge counts, their intersection, and recall in exact "
    "integer ppm. This is the ONLY entry that still executes the "
    "quadratic all-pairs kernel, deliberately, as the labeled "
    "correctness baseline; the production build it audits is the "
    "IVF-pivot multi-probe candidate path whose cost is bounded "
    "within cells (n_cells scales with the corpus, the semdedup "
    "knob). A recall regression here is the early-warning signal "
    "that the cell/probe knobs need retuning before the downstream "
    "structure mining silently degrades.",
)
def graph_mutual_knn_recall_audit(spark, sf_dir):
    exact = (
        _mutual_knn_edges_exact(spark, sf_dir)
        .where(F.col("src") < F.col("dst"))
        .localCheckpoint(eager=False)
    )
    bucketed = (
        _mutual_knn_edges(spark, sf_dir)
        .where(F.col("src") < F.col("dst"))
        .localCheckpoint(eager=False)
    )
    e = exact.agg(F.count(F.lit(1)).cast("long").alias("exact_edges"))
    b = bucketed.agg(
        F.count(F.lit(1)).cast("long").alias("bucketed_edges")
    )
    c = exact.join(bucketed, ["src", "dst"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("common_edges")
    )
    return (
        e.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(c))
        .select(
            "exact_edges",
            "bucketed_edges",
            "common_edges",
            F.expr(
                "CAST((1000000 * common_edges)"
                " div GREATEST(exact_edges, 1) AS BIGINT)"
            ).alias("recall_ppm"),
        )
    )


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
# Spark-SQL spelling of _toks_a() for use inside F.expr lambdas
_TOKS_A_SQL = "filter(split(lower(text), ' '), x -> x != '')"
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


# ---------------------------------------------------------------------------
# Entity resolution: blocked Fellegi-Sunter field-agreement scoring
# ---------------------------------------------------------------------------

# Integer log-odds-shaped weights: agreement adds w, disagreement
# subtracts u (Fellegi & Sunter 1969; Splink/dedupe.io ship the same
# shape). Floats never appear — the score is a pure integer sum.
_ER_W_SEG, _ER_U_SEG = 12, 4
_ER_W_BAND, _ER_U_BAND = 8, 3
_ER_W_CLOSE, _ER_U_CLOSE = 5, 2
_ER_THRESHOLD = 14
_ER_BAND_C = 100000       # 1000.00-unit acctbal bands (cents)
_ER_CLOSE_C = 5000        # |acctbal diff| <= 50.00 (cents)
_ER_SHIFT_C = 100000      # shift so band division is on positives only


@register(
    "er_blocked_match_score",
    f"""
    WITH c AS (
      SELECT c_custkey AS k, c_nationkey AS n, c_mktsegment AS seg,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal
      FROM customer
    ), scored AS (
      SELECT a.k AS a_key, b.k AS b_key,
             CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS seg_agree,
             CASE WHEN (a.bal + {_ER_SHIFT_C}) // {_ER_BAND_C}
                     = (b.bal + {_ER_SHIFT_C}) // {_ER_BAND_C}
                  THEN 1 ELSE 0 END AS band_agree,
             CASE WHEN abs(a.bal - b.bal) <= {_ER_CLOSE_C}
                  THEN 1 ELSE 0 END AS close_agree
      FROM c a JOIN c b ON a.n = b.n AND a.k < b.k
    )
    SELECT a_key, b_key,
           CAST(seg_agree AS BIGINT) AS seg_agree,
           CAST(band_agree AS BIGINT) AS band_agree,
           CAST(close_agree AS BIGINT) AS close_agree,
           CAST(seg_agree * {_ER_W_SEG} - (1 - seg_agree) * {_ER_U_SEG}
              + band_agree * {_ER_W_BAND} - (1 - band_agree) * {_ER_U_BAND}
              + close_agree * {_ER_W_CLOSE} - (1 - close_agree) * {_ER_U_CLOSE}
              AS BIGINT) AS score
    FROM scored
    WHERE seg_agree * {_ER_W_SEG} - (1 - seg_agree) * {_ER_U_SEG}
        + band_agree * {_ER_W_BAND} - (1 - band_agree) * {_ER_U_BAND}
        + close_agree * {_ER_W_CLOSE} - (1 - close_agree) * {_ER_U_CLOSE}
        >= {_ER_THRESHOLD}
    """,
    "Entity-resolution candidate scoring (Fellegi & Sunter 1969, the "
    "model behind Splink and dedupe.io): customers are BLOCKED by "
    "nation, and every within-block pair is scored by integer "
    "agreement weights over three comparison fields — market segment "
    "equality, same 1000-unit balance band (on shifted-positive cents "
    "so integer division never touches a negative), and balance "
    "within 50.00 — keeping pairs whose summed log-odds-shaped score "
    "clears the review threshold. The blocked self-join is the "
    "canonical record-linkage shape: quadratic ONLY within a block "
    "(the dedup_ngram_jaccard doctrine — blocks are the unit of "
    "scale-out, and a skewed block is salted or split by a second "
    "blocking pass at 100 TB), all-integer so the oracle replays it "
    "bit-for-bit.",
)
def er_blocked_match_score(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import cents

    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_nationkey").alias("n"),
        F.col("c_mktsegment").alias("seg"),
        cents("c_acctbal").alias("bal"),
    )
    a, b = c.alias("a"), c.alias("b")
    band = lambda side: F.expr(  # noqa: E731
        f"({side}.bal + {_ER_SHIFT_C}) div {_ER_BAND_C}"
    )
    scored = (
        a.join(
            b,
            (F.col("a.n") == F.col("b.n")) & (F.col("a.k") < F.col("b.k")),
        )
        .select(
            F.col("a.k").alias("a_key"),
            F.col("b.k").alias("b_key"),
            F.when(F.col("a.seg") == F.col("b.seg"), 1)
            .otherwise(0)
            .cast("long")
            .alias("seg_agree"),
            F.when(band("a") == band("b"), 1)
            .otherwise(0)
            .cast("long")
            .alias("band_agree"),
            F.when(
                F.abs(F.col("a.bal") - F.col("b.bal")) <= _ER_CLOSE_C, 1
            )
            .otherwise(0)
            .cast("long")
            .alias("close_agree"),
        )
        .withColumn(
            "score",
            (
                F.col("seg_agree") * _ER_W_SEG
                - (1 - F.col("seg_agree")) * _ER_U_SEG
                + F.col("band_agree") * _ER_W_BAND
                - (1 - F.col("band_agree")) * _ER_U_BAND
                + F.col("close_agree") * _ER_W_CLOSE
                - (1 - F.col("close_agree")) * _ER_U_CLOSE
            ).cast("long"),
        )
    )
    return scored.where(F.col("score") >= _ER_THRESHOLD)


# ---------------------------------------------------------------------------
# Pairwise win-rate matrix + Copeland ranking
# ---------------------------------------------------------------------------


@register(
    "eval_pairwise_winrate",
    """
    WITH s AS (
      SELECT user_id, event_type,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ), duel AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             CASE WHEN a.v >= b.v THEN a.event_type
                  ELSE b.event_type END AS winner
      FROM s a JOIN s b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
    ), matchup AS (
      SELECT ta, tb,
             CAST(SUM(CASE WHEN winner = ta THEN 1 ELSE 0 END) AS BIGINT) AS wa,
             CAST(SUM(CASE WHEN winner = tb THEN 1 ELSE 0 END) AS BIGINT) AS wb
      FROM duel GROUP BY 1, 2
    ), sides AS (
      SELECT ta AS event_type, wa AS w, wb AS l FROM matchup
      UNION ALL
      SELECT tb, wb, wa FROM matchup
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN w > l THEN 1 ELSE 0 END) AS BIGINT) AS n_beats,
           CAST(SUM(CASE WHEN w < l THEN 1 ELSE 0 END) AS BIGINT) AS n_losses,
           CAST(SUM(CASE WHEN w = l THEN 1 ELSE 0 END) AS BIGINT) AS n_ties,
           CAST(SUM(CASE WHEN w > l THEN 1 ELSE 0 END)
              - SUM(CASE WHEN w < l THEN 1 ELSE 0 END) AS BIGINT) AS copeland,
           CAST(SUM(w) AS BIGINT) AS n_user_wins
    FROM sides GROUP BY event_type
    """,
    "Pairwise win-rate matrix + Copeland ranking — the aggregation "
    "under every LLM-judge preference leaderboard (lmsys-style "
    "head-to-head tallies) stated on deterministic data: within each "
    "user, every pair of event types duels on total integer value "
    "(ties to the lexicographically smaller, so the duel is a total "
    "function), matchups tally per-user wins, and each type's "
    "Copeland score is #opponents-beaten minus #opponents-lost-to. "
    "Shape: one (user,type) aggregate, a within-user self-join whose "
    "fan-out is bounded by the TYPE-PAIR count (not data size), a "
    "types^2-row matchup table, then a constant-size union — the "
    "whole reduction after the first aggregate is dimension-sized at "
    "any corpus scale.",
)
def eval_pairwise_winrate(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import cents

    s = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.sum(cents("value")).alias("v"))
    )
    a, b = s.alias("a"), s.alias("b")
    duel = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.event_type").alias("ta"),
        F.col("b.event_type").alias("tb"),
        F.when(F.col("a.v") >= F.col("b.v"), F.col("a.event_type"))
        .otherwise(F.col("b.event_type"))
        .alias("winner"),
    )
    matchup = duel.groupBy("ta", "tb").agg(
        F.sum(F.when(F.col("winner") == F.col("ta"), 1).otherwise(0))
        .cast("long")
        .alias("wa"),
        F.sum(F.when(F.col("winner") == F.col("tb"), 1).otherwise(0))
        .cast("long")
        .alias("wb"),
    )
    sides = matchup.select(
        F.col("ta").alias("event_type"),
        F.col("wa").alias("w"),
        F.col("wb").alias("l"),
    ).unionAll(
        matchup.select(
            F.col("tb").alias("event_type"),
            F.col("wb").alias("w"),
            F.col("wa").alias("l"),
        )
    )
    return sides.groupBy("event_type").agg(
        F.sum(F.when(F.col("w") > F.col("l"), 1).otherwise(0))
        .cast("long")
        .alias("n_beats"),
        F.sum(F.when(F.col("w") < F.col("l"), 1).otherwise(0))
        .cast("long")
        .alias("n_losses"),
        F.sum(F.when(F.col("w") == F.col("l"), 1).otherwise(0))
        .cast("long")
        .alias("n_ties"),
        (
            F.sum(F.when(F.col("w") > F.col("l"), 1).otherwise(0))
            - F.sum(F.when(F.col("w") < F.col("l"), 1).otherwise(0))
        )
        .cast("long")
        .alias("copeland"),
        F.sum("w").cast("long").alias("n_user_wins"),
    )


# ---------------------------------------------------------------------------
# Theta/KMV sketch set intersection
# ---------------------------------------------------------------------------

_THETA_K = 64
_U32 = 4294967296
_H32_SPARK = "cast(conv(substring(md5({s}), 1, 8), 16, 10) AS BIGINT)"
_H32_DUCK = "(('0x' || substr(md5({s}), 1, 8))::BIGINT)"
_DAY_SPARK = "(ts div 1000) div 86400000000"
_DAY_DUCK = "epoch_us(ts) // 86400000000"


@register(
    "sketch_theta_intersect",
    f"""
    WITH elems AS (
      SELECT DISTINCT event_type,
             CAST(user_id AS VARCHAR) || ':' ||
             CAST({_DAY_DUCK} AS VARCHAR) AS e
      FROM events WHERE event_type IN ('click', 'purchase')
    ), hv AS (
      SELECT event_type, {_H32_DUCK.format(s='e')} AS h FROM elems
      GROUP BY 1, 2
    ), km AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n_distinct
      FROM hv
    ), sk AS (
      SELECT event_type,
             list_sort(list(h) FILTER (rn <= {_THETA_K})) AS kmv,
             MAX(n_distinct) AS nd
      FROM km GROUP BY event_type
    ), ab AS (
      SELECT a.kmv AS ka, b.kmv AS kb,
             CASE WHEN a.nd < {_THETA_K} THEN {_U32}
                  ELSE a.kmv[{_THETA_K}] END AS theta_a,
             CASE WHEN b.nd < {_THETA_K} THEN {_U32}
                  ELSE b.kmv[{_THETA_K}] END AS theta_b
      FROM sk a, sk b
      WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    ), co AS (
      SELECT LEAST(theta_a, theta_b) AS theta,
             len(list_filter(list_intersect(ka, kb),
                 x -> x < LEAST(theta_a, theta_b))) AS n_common
      FROM ab
    ), ex AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersect FROM (
        SELECT e FROM elems WHERE event_type = 'click'
        INTERSECT
        SELECT e FROM elems WHERE event_type = 'purchase'
      )
    )
    SELECT CAST(co.theta AS BIGINT) AS theta,
           CAST(co.n_common AS BIGINT) AS n_common,
           CAST((co.n_common * {_U32}) // co.theta AS BIGINT)
             AS est_intersect,
           ex.exact_intersect
    FROM co, ex
    """,
    "Theta/KMV sketch INTERSECTION (Dasgupta et al. 2016, the "
    "DataSketches theta family): the click and purchase user-day sets "
    "are each summarized by their 64 smallest md5-32 hash values, "
    "theta = min of the two k-th minima (or the full domain when a "
    "set is smaller than k), and |A intersect B| is estimated as "
    "(retained common hashes below theta) * U / theta in pure integer "
    "arithmetic — set algebra on constant-size state, which is the "
    "entire point: at 100 TB the two sketches are mergeable bottom-k "
    "heaps (the sketch_kmv_distinct shape) and the intersection is a "
    "64-element list operation, never a join of the raw sets. The "
    "exact intersection rides along as the audit column, computed "
    "once at gate scale.",
)
def sketch_theta_intersect(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    elems = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_type",
            F.concat_ws(
                ":",
                F.col("user_id").cast("string"),
                F.expr(_DAY_SPARK).cast("string"),
            ).alias("e"),
        )
        .distinct()
    )
    hv = elems.select(
        "event_type", F.expr(_H32_SPARK.format(s="e")).alias("h")
    ).distinct()
    wk = W.partitionBy("event_type").orderBy("h")
    km = hv.select(
        "event_type",
        "h",
        F.row_number().over(wk).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("nd"),
    )
    sk = (
        km.groupBy("event_type")
        .agg(
            F.sort_array(
                F.collect_list(F.when(F.col("rn") <= _THETA_K, F.col("h")))
            ).alias("kmv"),
            F.max("nd").alias("nd"),
        )
    )
    a = sk.where(F.col("event_type") == "click").select(
        F.col("kmv").alias("ka"), F.col("nd").alias("na")
    )
    b = sk.where(F.col("event_type") == "purchase").select(
        F.col("kmv").alias("kb"), F.col("nd").alias("nb")
    )
    ab = a.crossJoin(F.broadcast(b)).select(
        "ka",
        "kb",
        F.expr(
            f"CASE WHEN na < {_THETA_K} THEN {_U32}L "
            f"ELSE element_at(ka, {_THETA_K}) END"
        ).alias("theta_a"),
        F.expr(
            f"CASE WHEN nb < {_THETA_K} THEN {_U32}L "
            f"ELSE element_at(kb, {_THETA_K}) END"
        ).alias("theta_b"),
    )
    co = ab.select(
        F.least("theta_a", "theta_b").alias("theta"),
        F.size(
            F.filter(
                F.array_intersect("ka", "kb"),
                lambda x: x < F.least(F.col("theta_a"), F.col("theta_b")),
            )
        )
        .cast("long")
        .alias("n_common"),
    )
    ex = (
        elems.where(F.col("event_type") == "click")
        .select("e")
        .intersect(elems.where(F.col("event_type") == "purchase").select("e"))
        .agg(F.count(F.lit(1)).cast("long").alias("exact_intersect"))
    )
    return co.crossJoin(F.broadcast(ex)).select(
        F.col("theta").cast("long").alias("theta"),
        "n_common",
        F.expr(f"CAST((n_common * {_U32}L) div theta AS BIGINT)").alias(
            "est_intersect"
        ),
        "exact_intersect",
    )


# ---------------------------------------------------------------------------
# Deterministic permutation test (two-sample, sign-flip)
# ---------------------------------------------------------------------------

_PERM_T = 64


@register(
    "ab_permutation_test",
    f"""
    WITH um AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(ROUND(value * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS m
      FROM events GROUP BY user_id
    ), obs AS (
      SELECT CAST(SUM(CASE WHEN user_id % 2 = 0 THEN m ELSE -m END)
                  AS BIGINT) AS obs_diff_c
      FROM um
    ), perm AS (
      SELECT p.t,
             CAST(SUM(CASE WHEN
               {_H32_DUCK.format(s="CAST(u.user_id AS VARCHAR) || ':' || CAST(p.t AS VARCHAR)")}
               % 2 = 0 THEN u.m ELSE -u.m END) AS BIGINT) AS d
      FROM um u, (SELECT unnest(range({_PERM_T})) AS t) p
      GROUP BY p.t
    )
    SELECT obs.obs_diff_c,
           CAST(SUM(CASE WHEN abs(perm.d) >= abs(obs.obs_diff_c)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
           CAST({_PERM_T} AS BIGINT) AS n_perm,
           CAST((1000000 * SUM(CASE WHEN abs(perm.d) >= abs(obs.obs_diff_c)
                               THEN 1 ELSE 0 END)) // {_PERM_T} AS BIGINT)
             AS p_ppm
    FROM perm, obs
    GROUP BY obs.obs_diff_c
    """,
    "Two-sample permutation test with DETERMINISTIC sign-flips: the "
    "observed statistic is the even-vs-odd-user difference of total "
    "purchase cents; each of 64 permutations reassigns every user by "
    "the parity of md5(user:t) and recomputes the difference; the "
    "p-value numerator counts permutations at least as extreme. "
    "Hash-derived permutations replace RNG state so the test is a "
    "pure function of the data (the sample_hash_split doctrine), and "
    "all statistics are integer cents. Shape: one user aggregate, "
    "then a 64-way constant fan-out whose per-group traffic collapses "
    "map-side (each task emits <= 64 partial sums) — at 100 TB the "
    "permutation pass costs one extra scan of the USER AGGREGATE, "
    "never of the raw events.",
)
def ab_permutation_test(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import cents

    um = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", cents("value")
                ).otherwise(F.lit(0).cast("long"))
            ).alias("m")
        )
    )
    obs = um.agg(
        F.sum(
            F.when(F.col("user_id") % 2 == 0, F.col("m")).otherwise(-F.col("m"))
        )
        .cast("long")
        .alias("obs_diff_c")
    )
    ts = spark.range(0, _PERM_T).select(F.col("id").alias("t"))
    sign_h = _H32_SPARK.format(
        s="concat(cast(user_id as string), ':', cast(t as string))"
    )
    perm = (
        um.crossJoin(F.broadcast(ts))
        .select(
            "t",
            F.expr(
                f"CASE WHEN {sign_h} % 2 = 0 THEN m ELSE -m END"
            ).alias("sm"),
        )
        .groupBy("t")
        .agg(F.sum("sm").cast("long").alias("d"))
    )
    return (
        perm.crossJoin(F.broadcast(obs))
        .groupBy("obs_diff_c")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("d")) >= F.abs(F.col("obs_diff_c")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_ge"),
            F.lit(_PERM_T).cast("long").alias("n_perm"),
        )
        .select(
            "obs_diff_c",
            "n_ge",
            "n_perm",
            F.expr(f"CAST((1000000 * n_ge) div {_PERM_T} AS BIGINT)").alias(
                "p_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# k-truss of the mutual-kNN embedding graph
# ---------------------------------------------------------------------------

_TRUSS_K = 3
_TRUSS_ROUNDS = 6  # fixpoint at sf0.01/sf0.001 is round 2; monotone after


def _ktruss_oracle() -> str:
    """Unrolled replay of the fixed-round support peel. MATERIALIZED
    everywhere: each round references the previous edge set four times
    (two symmetrize arms + the support join + the filter)."""
    steps = []
    for i in range(1, _TRUSS_ROUNDS + 1):
        steps.append(f"""
    sym{i} AS MATERIALIZED (
      SELECT src, dst FROM e{i - 1}
      UNION ALL SELECT dst, src FROM e{i - 1}
    ),
    sup{i} AS MATERIALIZED (
      SELECT e.src, e.dst, COUNT(*) AS s
      FROM e{i - 1} e
      JOIN sym{i} x ON x.src = e.src
      JOIN sym{i} y ON y.src = e.dst AND y.dst = x.dst
      GROUP BY e.src, e.dst
    ),
    e{i} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e{i - 1} e
      JOIN sup{i} s ON s.src = e.src AND s.dst = e.dst
      WHERE s.s >= {_TRUSS_K - 2}
    )""")
    R = _TRUSS_ROUNDS
    return f"""
    WITH {_mutual_cte_sql("e0", canonical=True)},
    {','.join(steps)},
    symf AS MATERIALIZED (
      SELECT src, dst FROM e{R} UNION ALL SELECT dst, src FROM e{R}
    )
    SELECT e.src, e.dst, CAST(COUNT(*) AS BIGINT) AS support
    FROM e{R} e
    JOIN symf x ON x.src = e.src
    JOIN symf y ON y.src = e.dst AND y.dst = x.dst
    GROUP BY e.src, e.dst
    """


@register(
    "graph_ktruss_mutual_knn",
    _ktruss_oracle(),
    "k-truss extraction (Cohen 2008) over the same mutual-kNN "
    "embedding graph as graph_kcore_mutual_knn, but peeling EDGES by "
    "triangle support instead of vertices by degree — the stricter "
    "cohesion mining that keeps only relationships embedded in at "
    "least k-2 triangles (3-truss: every surviving edge closes a "
    "triangle), the community-backbone filter of graph mining. "
    "Support is the wedge join of triangle counting, bounded by the "
    "kNN degree cap; fixed 6 peel rounds against a measured round-2 "
    "fixpoint, unrolled-CTE oracle with MATERIALIZED rounds (each "
    "round reads the previous edge set four times). Round 7: runs on "
    "the BOUNDED IVF-pivot mutual-kNN build (_mutual_knn_edges), "
    "never all-pairs — see graph_mutual_knn_recall_audit. Output is "
    "the surviving canonical edge list with fixpoint support.",
)
def graph_ktruss_mutual_knn(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.operators.graph import ktruss_peel

    canon = (
        _mutual_knn_edges(spark, sf_dir)
        .where(F.col("src") < F.col("dst"))
    )
    return ktruss_peel(canon, k=_TRUSS_K, rounds=_TRUSS_ROUNDS)


# ---------------------------------------------------------------------------
# Zone-map file-skipping audit under two layouts
# ---------------------------------------------------------------------------

_ZM_FILES = 64
# 1995 quarters as epoch-day [lo, hi) literals
_ZM_QUARTERS = [
    ("1995Q1", 9131, 9221),
    ("1995Q2", 9221, 9312),
    ("1995Q3", 9312, 9404),
    ("1995Q4", 9404, 9496),
]
_ZM_Q_VALUES = ", ".join(f"('{q}', {lo}, {hi})" for q, lo, hi in _ZM_QUARTERS)


@register(
    "zonemap_skip_stats",
    f"""
    WITH li AS (
      SELECT (epoch_us(l_shipdate) // 86400000000) AS day,
             l_orderkey, l_linenumber
      FROM lineitem
    ), files AS (
      SELECT 'ingest' AS layout, day,
             NTILE({_ZM_FILES}) OVER (ORDER BY l_orderkey, l_linenumber)
               AS file_id
      FROM li
      UNION ALL
      SELECT 'sorted', day,
             NTILE({_ZM_FILES}) OVER (ORDER BY day, l_orderkey, l_linenumber)
      FROM li
    ), zm AS (
      SELECT layout, file_id, MIN(day) AS zmin, MAX(day) AS zmax,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM files GROUP BY 1, 2
    ), preds(quarter, lo, hi) AS (VALUES {_ZM_Q_VALUES}),
    truth AS (
      SELECT p.quarter, CAST(COUNT(*) AS BIGINT) AS rows_matched
      FROM li JOIN preds p ON li.day >= p.lo AND li.day < p.hi
      GROUP BY 1
    )
    SELECT zm.layout, p.quarter,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN zm.zmax < p.lo OR zm.zmin >= p.hi
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
           CAST(SUM(CASE WHEN zm.zmax < p.lo OR zm.zmin >= p.hi
                    THEN 0 ELSE zm.n_rows END) AS BIGINT) AS rows_scanned,
           MAX(t.rows_matched) AS rows_matched
    FROM zm CROSS JOIN preds p
    JOIN truth t ON t.quarter = p.quarter
    GROUP BY 1, 2
    """,
    "Zone-map (min/max statistics) file-skipping audit — the "
    "layout-to-scan-cost bridge behind every Parquet/Iceberg/Delta "
    "pruning decision: lineitem is laid out into 64 equal files two "
    "ways (ingest order vs shipdate-sorted), each file keeps its "
    "shipdate min/max, and four quarter predicates report how many "
    "files each layout lets the reader SKIP and how many rows the "
    "surviving files force it to scan, against the true match count "
    "as the lower bound. The sorted layout's near-perfect pruning vs "
    "the ingest layout's near-zero is the measured argument for "
    "OPTIMIZE/sort-on-write at 100 TB. The NTILE windows SIMULATE "
    "the two file layouts (a production layout job is a "
    "repartitionByRange + local sort, not a global window); the "
    "audit over the resulting zone maps is dimension-sized: 64 "
    "files x 4 predicates.",
)
def zonemap_skip_stats(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import ts_micros

    raw = t(spark, sf_dir, "lineitem")
    sd_dtype = dict(raw.dtypes).get("l_shipdate", "")
    li = raw.select(
        ts_micros(sd_dtype, "l_shipdate").alias("_us"),
        "l_orderkey",
        "l_linenumber",
    ).select(
        F.expr("_us div 86400000000").alias("day"),
        "l_orderkey",
        "l_linenumber",
    )
    w_ing = W.orderBy("l_orderkey", "l_linenumber")
    w_srt = W.orderBy("day", "l_orderkey", "l_linenumber")
    files = li.select(
        F.lit("ingest").alias("layout"),
        "day",
        F.ntile(_ZM_FILES).over(w_ing).alias("file_id"),
    ).unionAll(
        li.select(
            F.lit("sorted").alias("layout"),
            "day",
            F.ntile(_ZM_FILES).over(w_srt).alias("file_id"),
        )
    )
    zm = files.groupBy("layout", "file_id").agg(
        F.min("day").alias("zmin"),
        F.max("day").alias("zmax"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    preds = spark.createDataFrame(
        _ZM_QUARTERS, "quarter string, lo long, hi long"
    )
    truth = (
        li.join(
            F.broadcast(preds),
            (F.col("day") >= F.col("lo")) & (F.col("day") < F.col("hi")),
        )
        .groupBy("quarter")
        .agg(F.count(F.lit(1)).cast("long").alias("rows_matched"))
    )
    skipped = F.when(
        (F.col("zmax") < F.col("lo")) | (F.col("zmin") >= F.col("hi")), 1
    ).otherwise(0)
    return (
        zm.crossJoin(F.broadcast(preds))
        .join(F.broadcast(truth), "quarter")
        .groupBy("layout", "quarter")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(skipped).cast("long").alias("n_skipped"),
            F.sum(
                F.when(skipped == 1, 0).otherwise(F.col("n_rows"))
            )
            .cast("long")
            .alias("rows_scanned"),
            F.max("rows_matched").alias("rows_matched"),
        )
    )


# ---------------------------------------------------------------------------
# Length-bucketed batching: padding-waste audit
# ---------------------------------------------------------------------------

_BATCH_B = 32


@register(
    "batch_padding_waste",
    f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tok
      FROM documents
    ), assigned AS (
      SELECT 'arrival' AS policy, n_tok,
             (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // {_BATCH_B}
               AS batch_id
      FROM d
      UNION ALL
      SELECT 'length_sorted', n_tok,
             (ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id) - 1)
               // {_BATCH_B}
      FROM d
    ), batches AS (
      SELECT policy, batch_id,
             CAST(COUNT(*) AS BIGINT) AS bsz,
             CAST(MAX(n_tok) AS BIGINT) AS max_tok,
             CAST(SUM(n_tok) AS BIGINT) AS sum_tok
      FROM assigned GROUP BY 1, 2
    )
    SELECT policy,
           CAST(COUNT(*) AS BIGINT) AS n_batches,
           CAST(SUM(sum_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(bsz * max_tok - sum_tok) AS BIGINT) AS total_padding,
           CAST((1000000 * SUM(bsz * max_tok - sum_tok))
                // SUM(bsz * max_tok) AS BIGINT) AS pad_ppm
    FROM batches GROUP BY policy
    """,
    "Padding-waste audit of batch assembly — the training-efficiency "
    "decision every fixed-shape training loop makes: documents are "
    "grouped into batches of 32 under (a) arrival order and (b) "
    "length-sorted order, each batch pads to its longest member, and "
    "the audit reports total real tokens vs total padding tokens per "
    "policy in exact integers (pad_ppm = padding share of the padded "
    "volume). Length-bucketed batching's padding collapse vs arrival "
    "order is the measured justification for sorted bucketing in "
    "sequence-packing pipelines (the pack_sequences_linear sibling "
    "from the packing side). The global ROW_NUMBER simulates the "
    "batch assembly; production assembly range-partitions by length "
    "first — the waste accounting is identical.",
)
def batch_padding_waste(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(_toks_a()).cast("long").alias("n_tok")
    )
    w_arr = W.orderBy("doc_id")
    w_len = W.orderBy(F.desc("n_tok"), F.asc("doc_id"))
    assigned = d.select(
        F.lit("arrival").alias("policy"),
        "n_tok",
        ((F.row_number().over(w_arr) - 1) / _BATCH_B)
        .cast("long")
        .alias("batch_id"),
    ).unionAll(
        d.select(
            F.lit("length_sorted").alias("policy"),
            "n_tok",
            ((F.row_number().over(w_len) - 1) / _BATCH_B)
            .cast("long")
            .alias("batch_id"),
        )
    )
    batches = assigned.groupBy("policy", "batch_id").agg(
        F.count(F.lit(1)).cast("long").alias("bsz"),
        F.max("n_tok").alias("max_tok"),
        F.sum("n_tok").alias("sum_tok"),
    )
    return batches.groupBy("policy").agg(
        F.count(F.lit(1)).cast("long").alias("n_batches"),
        F.sum("sum_tok").cast("long").alias("total_tokens"),
        F.sum(F.col("bsz") * F.col("max_tok") - F.col("sum_tok"))
        .cast("long")
        .alias("total_padding"),
        F.expr(
            "CAST((1000000 * SUM(bsz * max_tok - sum_tok)) "
            "div SUM(bsz * max_tok) AS BIGINT)"
        ).alias("pad_ppm"),
    )


def _toks_a():
    return F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))


# ---------------------------------------------------------------------------
# Quality-filter ablation grid
# ---------------------------------------------------------------------------

_ABL_MIN_TOK = 30
_ABL_STOP_PCT = 5
_ABL_LANG = "en"
_STOPS_SQL = "('the','a','of','to','and','in','is')"


@register(
    "filter_ablation_grid",
    f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tok,
             CASE WHEN len({_TOKS_SQL}) >= {_ABL_MIN_TOK}
                  THEN 1 ELSE 0 END AS f_len,
             CASE WHEN 100 * len(list_filter({_TOKS_SQL},
                      x -> x IN {_STOPS_SQL}))
                      >= {_ABL_STOP_PCT} * len({_TOKS_SQL})
                  THEN 1 ELSE 0 END AS f_stop,
             CASE WHEN lang = '{_ABL_LANG}' THEN 1 ELSE 0 END AS f_lang
      FROM documents
    ), masks AS (SELECT unnest(range(8)) AS mask)
    SELECT m.mask,
           CAST(SUM(CASE WHEN ((m.mask & 1) = 0 OR d.f_len = 1)
                          AND ((m.mask & 2) = 0 OR d.f_stop = 1)
                          AND ((m.mask & 4) = 0 OR d.f_lang = 1)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
           CAST(SUM(CASE WHEN ((m.mask & 1) = 0 OR d.f_len = 1)
                          AND ((m.mask & 2) = 0 OR d.f_stop = 1)
                          AND ((m.mask & 4) = 0 OR d.f_lang = 1)
                    THEN d.n_tok ELSE 0 END) AS BIGINT) AS tokens_kept
    FROM d CROSS JOIN masks m
    GROUP BY m.mask
    """,
    "Quality-filter ablation grid — the Gopher-rules interaction table "
    "(Rae et al. 2021 app. A): three document filters (length >= 30 "
    "tokens, stopword ratio >= 5%, lang == en) evaluated over ALL 8 "
    "on/off subsets at once, reporting surviving docs and kept tokens "
    "per subset — the table a curation team reads to see which filter "
    "does the work, which are redundant, and what each marginal "
    "filter costs in tokens. One scan computes the three per-doc "
    "flags; the 8-row mask spine is a broadcast constant fan-out "
    "whose per-group traffic collapses map-side — at 100 TB the grid "
    "costs one extra pass of counters, never 8 filtered scans.",
)
def filter_ablation_grid(spark, sf_dir):
    toks = _toks_a()
    stops = ["the", "a", "of", "to", "and", "in", "is"]
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(
            F.filter(
                toks,
                lambda x: x.isin(*stops),
            )
        )
        .cast("long")
        .alias("n_stop"),
    ).select(
        "doc_id",
        "n_tok",
        F.when(F.col("n_tok") >= _ABL_MIN_TOK, 1).otherwise(0).alias("f_len"),
        F.when(
            100 * F.col("n_stop") >= _ABL_STOP_PCT * F.col("n_tok"), 1
        )
        .otherwise(0)
        .alias("f_stop"),
        F.when(F.col("lang") == _ABL_LANG, 1).otherwise(0).alias("f_lang"),
    )
    masks = spark.range(0, 8).select(F.col("id").alias("mask"))
    passes = (
        ((F.col("mask").bitwiseAND(F.lit(1)) == 0) | (F.col("f_len") == 1))
        & ((F.col("mask").bitwiseAND(F.lit(2)) == 0) | (F.col("f_stop") == 1))
        & ((F.col("mask").bitwiseAND(F.lit(4)) == 0) | (F.col("f_lang") == 1))
    )
    return (
        d.crossJoin(F.broadcast(masks))
        .groupBy("mask")
        .agg(
            F.sum(F.when(passes, 1).otherwise(0))
            .cast("long")
            .alias("n_survivors"),
            F.sum(F.when(passes, F.col("n_tok")).otherwise(0))
            .cast("long")
            .alias("tokens_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Watermark lateness audit
# ---------------------------------------------------------------------------

_WM_CANDIDATES_S = (0, 900, 1800, 3600)
_WM_WINDOW_S = 3600
_WM_MAX_DELAY_S = 7200
_WM_VALUES = ", ".join(
    f"(CAST({w} AS BIGINT))" for w in _WM_CANDIDATES_S
)


@register(
    "late_event_audit",
    f"""
    WITH e AS (
      SELECT event_id, epoch_ns(ts) AS tsn,
             epoch_ns(ts) + ({_H32_DUCK.format(s="CAST(event_id AS VARCHAR)")}
                % {_WM_MAX_DELAY_S}) * 1000000000 AS arrival
      FROM events
    ), r AS (
      SELECT event_id, tsn, arrival,
             ((tsn // {_WM_WINDOW_S}000000000) + 1)
               * {_WM_WINDOW_S}000000000 AS win_end,
             MAX(tsn) OVER (ORDER BY arrival, event_id
                            ROWS UNBOUNDED PRECEDING) AS seen_max
      FROM e
    ), wm(watermark_s) AS (VALUES {_WM_VALUES})
    SELECT wm.watermark_s,
           CAST(SUM(CASE WHEN r.seen_max - wm.watermark_s * 1000000000
                              > r.win_end THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           CAST(SUM(CASE WHEN r.seen_max - wm.watermark_s * 1000000000
                              > r.win_end THEN 0 ELSE 1 END) AS BIGINT)
             AS n_kept,
           CAST((1000000 * SUM(CASE WHEN r.seen_max
                    - wm.watermark_s * 1000000000 > r.win_end
                    THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
             AS dropped_ppm
    FROM r CROSS JOIN wm
    GROUP BY wm.watermark_s
    """,
    "Watermark lateness audit — the tuning table behind every "
    "Structured Streaming withWatermark() decision, computed batch-"
    "side with real watermark SEMANTICS: each event's arrival is a "
    "deterministic hash-derived delay (0..2h) after its event time, "
    "the stream watermark at any arrival is (max event time seen so "
    "far, in arrival order) minus the candidate delay, and an event "
    "is DROPPED when the watermark has already passed its 1-hour "
    "tumbling window's end — exactly the state-eviction rule the "
    "streaming engine applies. Four candidate watermarks are scored "
    "in one pass: running max over arrival order + a 4-row constant "
    "spine (dimension fan-out, map-side collapse). The global "
    "arrival-order window simulates the single logical stream; a "
    "production replay range-partitions by arrival time first.",
)
def late_event_audit(spark, sf_dir):
    e = t(spark, sf_dir, "events").select(
        "event_id",
        F.col("ts").alias("tsn"),
        (
            F.col("ts")
            + F.expr(
                _H32_SPARK.format(s="cast(event_id as string)")
                + f" % {_WM_MAX_DELAY_S}"
            )
            * F.lit(1000000000)
        ).alias("arrival"),
    )
    wr = W.orderBy("arrival", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    r = e.select(
        "event_id",
        "tsn",
        F.expr(
            f"((tsn div {_WM_WINDOW_S}000000000) + 1) "
            f"* {_WM_WINDOW_S}000000000"
        ).alias("win_end"),
        F.max("tsn").over(wr).alias("seen_max"),
    )
    wm = spark.createDataFrame(
        [(w,) for w in _WM_CANDIDATES_S], "watermark_s long"
    )
    dropped = F.when(
        F.col("seen_max") - F.col("watermark_s") * 1000000000
        > F.col("win_end"),
        1,
    ).otherwise(0)
    return (
        r.crossJoin(F.broadcast(wm))
        .groupBy("watermark_s")
        .agg(
            F.sum(dropped).cast("long").alias("n_dropped"),
            F.sum(1 - dropped).cast("long").alias("n_kept"),
            F.expr(
                "CAST((1000000 * SUM(CASE WHEN seen_max - watermark_s "
                "* 1000000000 > win_end THEN 1 ELSE 0 END)) "
                "div COUNT(*) AS BIGINT)"
            ).alias("dropped_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Fagin threshold-algorithm (TA) top-k audit
# ---------------------------------------------------------------------------

_TA_K = 10
_TA_DEPTH_CAP = 128


@register(
    "retrieval_threshold_algorithm",
    f"""
    WITH d AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS sa,
             CAST(100 * len(list_distinct({_TOKS_SQL})) AS BIGINT) AS sb
      FROM documents
    ), ra AS (
      SELECT doc_id, sa, sb,
             ROW_NUMBER() OVER (ORDER BY sa DESC, doc_id) AS rka
      FROM d
    ), rb AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sb DESC, doc_id) AS rkb
      FROM d
    ), j AS (
      SELECT ra.doc_id, ra.sa + ra.sb AS total,
             LEAST(ra.rka, rb.rkb) AS mr
      FROM ra JOIN rb USING (doc_id)
    ), thr AS (
      SELECT a.rka AS dep, a.sa + b.sb AS thr
      FROM (SELECT ROW_NUMBER() OVER (ORDER BY sa DESC, doc_id) AS rka,
                   sa FROM d) a
      JOIN (SELECT ROW_NUMBER() OVER (ORDER BY sb DESC, doc_id) AS rkb,
                   sb FROM d) b ON a.rka = b.rkb
      WHERE a.rka <= {_TA_DEPTH_CAP}
    ), q AS (
      SELECT j.doc_id, j.total, j.mr,
             GREATEST(j.mr, COALESCE(
               (SELECT MIN(t.dep) FROM thr t WHERE t.thr <= j.total),
               {_TA_DEPTH_CAP + 1})) AS qd
      FROM j
    ), stopd AS (
      SELECT qd AS stop_depth FROM q
      ORDER BY qd, doc_id LIMIT 1 OFFSET {_TA_K - 1}
    ), touched AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_touched
      FROM q, stopd WHERE q.mr <= stopd.stop_depth
    ), topk AS (
      SELECT doc_id, total,
             ROW_NUMBER() OVER (ORDER BY total DESC, doc_id) AS rank_total
      FROM j
    )
    SELECT tk.doc_id, tk.total, CAST(tk.rank_total AS BIGINT) AS rank_total,
           CAST(s.stop_depth AS BIGINT) AS stop_depth, t.n_touched
    FROM topk tk, stopd s, touched t
    WHERE tk.rank_total <= {_TA_K}
    """,
    "Threshold-algorithm top-k audit (Fagin, Lotem & Naor 2001 — the "
    "instance-optimal rank-join behind multi-signal retrieval): two "
    "ranked lists (chars, 100x distinct tokens) are walked in "
    "parallel, the depth-d threshold is the sum of the two scores AT "
    "rank d, and TA halts at the first depth where k=10 seen "
    "documents already score above it. The audit derives the halt "
    "depth SET-BASED: each doc qualifies at max(its min rank, the "
    "first depth whose threshold its total clears — threshold is "
    "monotone nonincreasing so that crossing is a min over a capped "
    "128-row broadcast), and the k-th smallest qualify-depth IS the "
    "stop depth. Output: the exact top-k with the stop depth and how "
    "few documents TA touched (~20 of 500 at gate scale) — the "
    "measured case for early-termination top-k over full scans when "
    "lists are precomputed per-signal at 100 TB.",
)
def retrieval_threshold_algorithm(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("sa"),
        (100 * F.size(F.array_distinct(_toks_a()))).cast("long").alias("sb"),
    )
    wa = W.orderBy(F.desc("sa"), F.asc("doc_id"))
    wb = W.orderBy(F.desc("sb"), F.asc("doc_id"))
    ranked = d.select(
        "doc_id",
        "sa",
        "sb",
        F.row_number().over(wa).alias("rka"),
        F.row_number().over(wb).alias("rkb"),
    )
    j = ranked.select(
        "doc_id",
        (F.col("sa") + F.col("sb")).alias("total"),
        F.least("rka", "rkb").alias("mr"),
    )
    thr = (
        ranked.select(F.col("rka").alias("dep"), "sa")
        .join(
            ranked.select(F.col("rkb").alias("dep"), "sb"),
            "dep",
        )
        .where(F.col("dep") <= _TA_DEPTH_CAP)
        .select("dep", (F.col("sa") + F.col("sb")).alias("thr"))
    )
    tmin = (
        j.join(F.broadcast(thr), F.col("thr") <= F.col("total"), "left")
        .groupBy("doc_id", "total", "mr")
        .agg(F.min("dep").alias("t_first"))
    )
    q = tmin.select(
        "doc_id",
        "total",
        "mr",
        F.greatest(
            F.col("mr"),
            F.coalesce(F.col("t_first"), F.lit(_TA_DEPTH_CAP + 1)),
        ).alias("qd"),
    )
    wq = W.orderBy(F.asc("qd"), F.asc("doc_id"))
    stopd = (
        q.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") == _TA_K)
        .select(F.col("qd").cast("long").alias("stop_depth"))
    )
    touched = (
        q.crossJoin(F.broadcast(stopd))
        .where(F.col("mr") <= F.col("stop_depth"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_touched"))
    )
    wt = W.orderBy(F.desc("total"), F.asc("doc_id"))
    topk = (
        j.withColumn("rank_total", F.row_number().over(wt))
        .where(F.col("rank_total") <= _TA_K)
        .select("doc_id", "total", F.col("rank_total").cast("long").alias("rank_total"))
    )
    return topk.crossJoin(F.broadcast(stopd)).crossJoin(F.broadcast(touched))


# ---------------------------------------------------------------------------
# Skyline (Pareto frontier) operator
# ---------------------------------------------------------------------------


@register(
    "skyline_pareto_frontier",
    f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len(list_distinct({_TOKS_SQL})) AS BIGINT) AS quality,
             CAST(n_chars AS BIGINT) AS size
      FROM documents
    )
    SELECT a.doc_id, a.quality, a.size
    FROM d a
    WHERE NOT EXISTS (
      SELECT 1 FROM d b
      WHERE b.quality >= a.quality AND b.size >= a.size
        AND (b.quality > a.quality OR b.size > a.size)
    )
    """,
    "Skyline / Pareto-frontier operator (Borzsonyi, Kossmann & "
    "Stocker 2001): the documents no other document dominates on "
    "(distinct-token quality, char size) — the preference-query "
    "primitive behind 'best tradeoff' corpus picks (longest AND "
    "richest docs, cost/quality frontiers). The Spark plan is the "
    "LINEAR skyline algorithm, not the quadratic definition: one "
    "per-quality max-size aggregate, one running max over strictly "
    "higher quality levels (dimension-sized window), and a doc is on "
    "the frontier iff it holds its quality level's max size and "
    "beats every higher level's best — O(n) + a vocab-sized sort vs "
    "the oracle's NOT EXISTS self-join, which independently replays "
    "the DEFINITION. Ties kept on both sides: equal (quality, size) "
    "pairs do not dominate each other.",
)
def skyline_pareto_frontier(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.array_distinct(_toks_a())).cast("long").alias("quality"),
        F.col("n_chars").cast("long").alias("size"),
    )
    perq = d.groupBy("quality").agg(F.max("size").alias("mq"))
    wq = W.orderBy(F.desc("quality")).rowsBetween(
        W.unboundedPreceding, -1
    )
    lvl = perq.select(
        "quality",
        "mq",
        F.max("mq").over(wq).alias("best_higher"),
    )
    return (
        d.join(F.broadcast(lvl), "quality")
        .where(
            (F.col("size") == F.col("mq"))
            & (
                F.col("best_higher").isNull()
                | (F.col("best_higher") < F.col("size"))
            )
        )
        .select("doc_id", "quality", "size")
    )


# ---------------------------------------------------------------------------
# Holt linear-trend fold (double exponential smoothing, integer state)
# ---------------------------------------------------------------------------


@register(
    "holt_linear_fold",
    """
    WITH RECURSIVE x AS (
      SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS rn,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events
    ), r AS (
      SELECT user_id, rn, v AS l, CAST(0 AS BIGINT) AS b,
             v AS l_prev
      FROM x WHERE rn = 1
      UNION ALL
      -- two carried registers; FLOOR spelled explicitly (DuckDB integer
      -- // truncates toward zero, the kernel floors; trend deltas DO go
      -- negative). Operands stay far below 2^53: double FLOOR is exact.
      SELECT x.user_id, x.rn,
             CAST(FLOOR((x.v + r.l + r.b) / 2.0) AS BIGINT),
             CAST(FLOOR((CAST(FLOOR((x.v + r.l + r.b) / 2.0) AS BIGINT)
                         - r.l + r.b) / 2.0) AS BIGINT),
             r.l
      FROM r JOIN x ON x.user_id = r.user_id AND x.rn = r.rn + 1
    ), n AS (
      SELECT user_id, CAST(MAX(rn) AS BIGINT) AS n_events
      FROM x GROUP BY user_id
    )
    SELECT n.user_id, n.n_events, r.l AS level_c, r.b AS trend_c,
           r.l + r.b AS forecast_c
    FROM n JOIN r ON r.user_id = n.user_id AND r.rn = n.n_events
    """,
    "Holt linear-trend fold (double exponential smoothing, alpha = "
    "beta = 1/2) over each user's time-ordered cent values — TWO "
    "carried integer registers per key where ewma_user_value carries "
    "one: l_t = floor((v_t + l_(t-1) + b_(t-1))/2), b_t = "
    "floor((l_t - l_(t-1) + b_(t-1))/2), forecast = l_n + b_n; the "
    "one-step-ahead demand forecast every per-entity capacity model "
    "runs. Same Arrow doctrine as the EWMA kernel: ONE shuffle on "
    "user_id + sortWithinPartitions, a single segmented-fold "
    "mapInPandas kernel carrying state across batch boundaries, "
    "Python floor-division matched by explicit FLOOR in the "
    "recursive-CTE oracle (trend deltas go negative, where truncation "
    "would diverge). State is O(keys-per-partition) x 3 ints; nothing "
    "lands on the driver.",
)
def holt_linear_fold(spark, sf_dir):
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from youtube_trending_data_pipeline_spark.catalog import cents

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("ts div 1000").alias("ts_us"),
        cents("value").alias("v"),
    )
    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("level_c", LongType()),
            StructField("trend_c", LongType()),
            StructField("forecast_c", LongType()),
        ]
    )

    def fold(batches):
        # state: user -> [n, level, trend]; the ewma_user_value segmented
        # fold with a second carried register (see that kernel's notes).
        state: dict[int, list[int]] = {}
        for pdf in batches:
            u = pdf["user_id"].to_numpy()
            if not len(u):
                continue
            v = pdf["v"].to_numpy()
            cuts = np.flatnonzero(u[1:] != u[:-1]) + 1
            starts = np.concatenate(([0], cuts)).tolist()
            ends = np.concatenate((cuts, [len(u)])).tolist()
            for a, bnd in zip(starts, ends):
                run = v[a:bnd].tolist()
                s = state.get(int(u[a]))
                if s is None:
                    lv, tr = run[0], 0
                    rest = run[1:]
                    state[int(u[a])] = s = [bnd - a, lv, tr]
                else:
                    lv, tr = s[1], s[2]
                    rest = run
                    s[0] += bnd - a
                for x in rest:
                    nl = (x + lv + tr) // 2
                    tr = (nl - lv + tr) // 2
                    lv = nl
                s[1], s[2] = lv, tr
        if state:
            yield pd.DataFrame(
                {
                    "user_id": list(state.keys()),
                    "n_events": [s[0] for s in state.values()],
                    "level_c": [s[1] for s in state.values()],
                    "trend_c": [s[2] for s in state.values()],
                    "forecast_c": [s[1] + s[2] for s in state.values()],
                }
            )

    return (
        ev.repartition("user_id")
        .sortWithinPartitions("user_id", "ts_us", "event_id")
        .mapInPandas(fold, schema=schema)
    )


# ---------------------------------------------------------------------------
# Incremental view maintenance: delta application vs recompute
# ---------------------------------------------------------------------------

_IVM_SPLIT_DAYS = 7          # base = first week of the corpus
_IVM_DELTA_DAYS = 2          # delta batch = next two days of inserts
_IVM_RETRACT_MOD = 37        # base rows with event_id % 37 == 0 retract


@register(
    "ivm_delta_aggregate",
    f"""
    WITH e AS (
      SELECT event_id, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS v,
             epoch_us(ts) // 86400000000 AS day
      FROM events
    ), b AS (SELECT MIN(day) AS d0 FROM e),
    base AS (
      SELECT e.* FROM e, b WHERE e.day < b.d0 + {_IVM_SPLIT_DAYS}
    ), inserts AS (
      SELECT e.* FROM e, b
      WHERE e.day >= b.d0 + {_IVM_SPLIT_DAYS}
        AND e.day < b.d0 + {_IVM_SPLIT_DAYS + _IVM_DELTA_DAYS}
    ), retracts AS (
      SELECT * FROM base WHERE event_id % {_IVM_RETRACT_MOD} = 0
    ), signed_delta AS (
      SELECT event_type, v, CAST(1 AS BIGINT) AS mult FROM inserts
      UNION ALL
      SELECT event_type, v, CAST(-1 AS BIGINT) FROM retracts
    ), view0 AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s
      FROM base GROUP BY 1
    ), delta AS (
      SELECT event_type, CAST(SUM(mult) AS BIGINT) AS dn,
             CAST(SUM(mult * v) AS BIGINT) AS ds
      FROM signed_delta GROUP BY 1
    ), maintained AS (
      SELECT COALESCE(v.event_type, d.event_type) AS event_type,
             COALESCE(v.n, 0) + COALESCE(d.dn, 0) AS mn,
             COALESCE(v.s, 0) + COALESCE(d.ds, 0) AS ms
      FROM view0 v FULL OUTER JOIN delta d USING (event_type)
    ), recomputed AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS rn,
             CAST(SUM(v) AS BIGINT) AS rs
      FROM (
        SELECT * FROM base WHERE event_id % {_IVM_RETRACT_MOD} <> 0
        UNION ALL SELECT * FROM inserts
      ) GROUP BY 1
    )
    SELECT m.event_type,
           CAST(m.mn AS BIGINT) AS maintained_n,
           r.rn AS recomputed_n,
           CAST(m.ms AS BIGINT) AS maintained_sum,
           r.rs AS recomputed_sum,
           CAST(CASE WHEN m.mn = r.rn AND m.ms = r.rs
                THEN 1 ELSE 0 END AS BIGINT) AS consistent
    FROM maintained m JOIN recomputed r USING (event_type)
    """,
    "Incremental view maintenance audit — the delta rule every "
    "foreachBatch upsert and materialized-view engine depends on, "
    "PROVEN against recompute in one query: a per-type count/sum view "
    "over the first week of events is maintained by applying a signed "
    "multiplicity delta (next-two-days inserts at +1, hash-chosen "
    "base retractions at -1) and must equal the from-scratch "
    "aggregate over (base minus retractions) union inserts. "
    "Count/sum are self-maintainable, so the maintained path touches "
    "ONLY the delta — at 100 TB that is the difference between "
    "re-aggregating the lake and aggregating a day's partition; the "
    "consistency flag makes the multiset algebra auditable. All "
    "integer cents; full-outer delta merge handles types that appear "
    "only in the delta.",
)
def ivm_delta_aggregate(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import cents

    e = t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        cents("value").alias("v"),
        F.expr("(ts div 1000) div 86400000000").alias("day"),
    )
    b = e.agg(F.min("day").alias("d0"))
    e = e.crossJoin(F.broadcast(b))
    base = e.where(F.col("day") < F.col("d0") + _IVM_SPLIT_DAYS)
    inserts = e.where(
        (F.col("day") >= F.col("d0") + _IVM_SPLIT_DAYS)
        & (F.col("day") < F.col("d0") + _IVM_SPLIT_DAYS + _IVM_DELTA_DAYS)
    )
    retracts = base.where(F.col("event_id") % _IVM_RETRACT_MOD == 0)
    signed_delta = inserts.select(
        "event_type", "v", F.lit(1).cast("long").alias("mult")
    ).unionAll(
        retracts.select(
            "event_type", "v", F.lit(-1).cast("long").alias("mult")
        )
    )
    view0 = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
    )
    delta = signed_delta.groupBy("event_type").agg(
        F.sum("mult").cast("long").alias("dn"),
        F.sum(F.col("mult") * F.col("v")).cast("long").alias("ds"),
    )
    maintained = (
        view0.join(delta, "event_type", "full_outer")
        .select(
            "event_type",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0)))
            .cast("long")
            .alias("maintained_n"),
            (F.coalesce("s", F.lit(0)) + F.coalesce("ds", F.lit(0)))
            .cast("long")
            .alias("maintained_sum"),
        )
    )
    recomputed = (
        base.where(F.col("event_id") % _IVM_RETRACT_MOD != 0)
        .select("event_type", "v")
        .unionAll(inserts.select("event_type", "v"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("recomputed_n"),
            F.sum("v").cast("long").alias("recomputed_sum"),
        )
    )
    return maintained.join(recomputed, "event_type").select(
        "event_type",
        "maintained_n",
        "recomputed_n",
        "maintained_sum",
        "recomputed_sum",
        F.when(
            (F.col("maintained_n") == F.col("recomputed_n"))
            & (F.col("maintained_sum") == F.col("recomputed_sum")),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("consistent"),
    )


# ---------------------------------------------------------------------------
# Exact median by two-pass bucket selection (no global sort)
# ---------------------------------------------------------------------------

_MED_BUCKET_C = 10000  # 100.00-unit buckets


@register(
    "exact_median_twopass",
    f"""
    WITH x AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v
      FROM lineitem
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST((COUNT(*) + 1) // 2 AS BIGINT) AS k
      FROM x
    ), bkt AS (
      SELECT v // {_MED_BUCKET_C} AS b, CAST(COUNT(*) AS BIGINT) AS c
      FROM x GROUP BY 1
    ), cum AS (
      SELECT b, c,
             SUM(c) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS run
      FROM bkt
    ), target AS (
      SELECT cum.b AS tb, cum.c AS bucket_rows,
             cum.run - cum.c AS before_cnt, n.n, n.k
      FROM cum, n
      WHERE cum.run >= n.k AND cum.run - cum.c < n.k
    ), sel AS (
      SELECT x.v, ROW_NUMBER() OVER (ORDER BY x.v) AS rno
      FROM x, target WHERE x.v // {_MED_BUCKET_C} = target.tb
    )
    SELECT t.n, t.k, t.tb AS bucket_id, t.bucket_rows, s.v AS median_c
    FROM target t JOIN sel s ON s.rno = t.k - t.before_cnt
    """,
    "Exact median WITHOUT a global sort — two-pass bucket selection, "
    "the scalable order-statistic algorithm (Blum et al. selection "
    "by partition counts): pass 1 is one hash aggregate of 100.00-"
    "unit bucket counts whose running sum locates the bucket holding "
    "the k-th value (k = (N+1)/2), pass 2 sorts ONLY that bucket "
    "(~N/buckets rows) and offsets to the exact answer. At 100 TB "
    "a global sort of the value column is the thing you cannot "
    "afford; two counting passes + one bucket-local sort is the "
    "shape percentile services actually run. Output keeps the "
    "audit trail (N, k, chosen bucket, rows the second pass "
    "touched); the oracle replays the same selection by definition "
    "(ORDER BY ... OFFSET).",
)
def exact_median_twopass(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import cents

    x = t(spark, sf_dir, "lineitem").select(
        cents("l_extendedprice").alias("v")
    )
    n = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("CAST((COUNT(*) + 1) div 2 AS BIGINT)").alias("k"),
    )
    bkt = (
        x.select(F.expr(f"v div {_MED_BUCKET_C}").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wc = W.orderBy("b").rowsBetween(W.unboundedPreceding, 0)
    cum = bkt.select(
        "b", "c", F.sum("c").over(wc).alias("run")
    )
    target = (
        cum.crossJoin(F.broadcast(n))
        .where(
            (F.col("run") >= F.col("k"))
            & (F.col("run") - F.col("c") < F.col("k"))
        )
        .select(
            F.col("b").alias("tb"),
            F.col("c").alias("bucket_rows"),
            (F.col("run") - F.col("c")).alias("before_cnt"),
            "n",
            "k",
        )
    )
    in_bucket = x.join(
        F.broadcast(target),
        F.expr(f"v div {_MED_BUCKET_C}") == F.col("tb"),
    )
    wv = W.orderBy("v")
    median = (
        in_bucket.withColumn("rn", F.row_number().over(wv))
        .where(F.col("rn") == F.col("k") - F.col("before_cnt"))
        .select(
            "n",
            "k",
            F.col("tb").alias("bucket_id"),
            "bucket_rows",
            F.col("v").alias("median_c"),
        )
    )
    return median


# ---------------------------------------------------------------------------
# Join-key skew diagnosis report
# ---------------------------------------------------------------------------


@register(
    "skew_diagnosis_report",
    """
    WITH f AS (
      SELECT l_suppkey AS key, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ), o AS (
      SELECT key, c,
             ROW_NUMBER() OVER (ORDER BY c, key) AS rn,
             COUNT(*) OVER () AS nk,
             SUM(c) OVER () AS total
      FROM f
    )
    SELECT CAST(MAX(nk) AS BIGINT) AS n_keys,
           CAST(MAX(total) AS BIGINT) AS n_rows,
           CAST(MAX(c) AS BIGINT) AS max_freq,
           CAST(MAX(CASE WHEN rn = (nk + 1) // 2 THEN c END) AS BIGINT)
             AS p50_freq,
           CAST(MAX(CASE WHEN rn = nk - (nk // 100) THEN c END) AS BIGINT)
             AS p99_freq,
           CAST((1000000 * MAX(c) * MAX(nk)) // MAX(total) AS BIGINT)
             AS imbalance_ppm,
           CAST(MAX(CASE WHEN c = (SELECT MAX(c) FROM f)
                    THEN key END) AS BIGINT) AS heaviest_key
    FROM o
    """,
    "Join-key skew diagnosis — the report you read BEFORE choosing "
    "j10_salted_skew_join's salt factor or trusting AQE skew "
    "handling: the lineitem supplier-key frequency table reduced to "
    "key count, row count, max/p50/p99 per-key frequency (order "
    "statistics over the KEY table, never the fact table), the "
    "max-over-mean imbalance in ppm (straggler factor: the slowest "
    "reducer's load relative to perfect balance), and the heaviest "
    "key itself (max frequency, largest key on ties). One hash "
    "aggregate + one key-table window: the diagnosis costs a "
    "key-cardinality pass regardless of fact-table size.",
)
def skew_diagnosis_report(spark, sf_dir):
    f = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_suppkey").alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wo = W.orderBy("c", "key")
    o = f.select(
        "key",
        "c",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("nk"),
        F.sum("c").over(W.partitionBy()).alias("total"),
        F.max("c").over(W.partitionBy()).alias("mx"),
    )
    return o.agg(
        F.max("nk").cast("long").alias("n_keys"),
        F.max("total").cast("long").alias("n_rows"),
        F.max("c").cast("long").alias("max_freq"),
        F.max(
            F.when(F.col("rn") == F.expr("(nk + 1) div 2"), F.col("c"))
        )
        .cast("long")
        .alias("p50_freq"),
        F.max(
            F.when(F.col("rn") == F.expr("nk - (nk div 100)"), F.col("c"))
        )
        .cast("long")
        .alias("p99_freq"),
        F.expr(
            "CAST((1000000 * MAX(c) * MAX(nk)) div MAX(total) AS BIGINT)"
        ).alias("imbalance_ppm"),
        F.max(F.when(F.col("c") == F.col("mx"), F.col("key")))
        .cast("long")
        .alias("heaviest_key"),
    )


# ---------------------------------------------------------------------------
# Consistent-hash ring: shard rebalance audit
# ---------------------------------------------------------------------------

_CH_SHARDS_BEFORE = 8
_CH_VNODES = 32


def _ch_ring_sql(n_shards: int) -> str:
    h = _H32_DUCK.format(
        s="'shard' || CAST(s.s AS VARCHAR) || ':' || CAST(v.v AS VARCHAR)"
    )
    return f"""
      SELECT {h} AS h, MIN(s.s) AS shard
      FROM (SELECT unnest(range({n_shards})) AS s) s,
           (SELECT unnest(range({_CH_VNODES})) AS v) v
      GROUP BY 1
    """


def _ch_assign_sql(ring: str) -> str:
    return f"""
      SELECT d.doc_id,
             COALESCE(
               MIN(CASE WHEN r.h >= d.pos THEN r.h END),
               MIN(r.h)) AS chosen_h
      FROM docs d CROSS JOIN ({ring}) r
      GROUP BY d.doc_id
    """


@register(
    "consistent_hash_rebalance",
    f"""
    WITH docs AS (
      SELECT doc_id,
             {_H32_DUCK.format(s="CAST(doc_id AS VARCHAR)")} AS pos
      FROM documents
    ), ring_a AS ({_ch_ring_sql(_CH_SHARDS_BEFORE)}),
    ring_b AS ({_ch_ring_sql(_CH_SHARDS_BEFORE + 1)}),
    ch_a AS ({_ch_assign_sql('SELECT * FROM ring_a')}),
    ch_b AS ({_ch_assign_sql('SELECT * FROM ring_b')}),
    consistent AS (
      SELECT 'consistent' AS strategy,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN ra.shard <> rb.shard THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_moved
      FROM ch_a a JOIN ch_b b USING (doc_id)
      JOIN ring_a ra ON ra.h = a.chosen_h
      JOIN ring_b rb ON rb.h = b.chosen_h
    ), naive AS (
      SELECT 'mod' AS strategy,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN pos % {_CH_SHARDS_BEFORE}
                            <> pos % {_CH_SHARDS_BEFORE + 1}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
      FROM docs
    ), u AS (
      SELECT * FROM consistent UNION ALL SELECT * FROM naive
    )
    SELECT strategy, n_docs, n_moved,
           CAST((1000000 * n_moved) // n_docs AS BIGINT) AS moved_ppm
    FROM u
    """,
    "Consistent-hash ring rebalance audit (Karger et al. 1997): "
    "documents are placed on a 32-vnode-per-shard md5 ring, a ninth "
    "shard is added, and the audit reports what fraction of documents "
    "MOVE under ring assignment (~1/9) versus naive modulo sharding "
    "(~8/9) — the measured justification for ring placement in every "
    "shuffle-stable store and streaming-state assignment. Ring "
    "assignment ('first vnode clockwise, wrap to ring minimum') is a "
    "conditional MIN over the 288-row broadcast ring — dimension "
    "fan-out, map-side collapse, no row ever leaves its partition; "
    "vnode hash collisions are canonicalized to the smallest shard "
    "so both engines resolve ties identically.",
)
def consistent_hash_rebalance(spark, sf_dir):
    def ring(n_shards):
        s = spark.range(0, n_shards).select(F.col("id").alias("s"))
        v = spark.range(0, _CH_VNODES).select(F.col("id").alias("v"))
        h = _H32_SPARK.format(
            s="concat('shard', cast(s as string), ':', cast(v as string))"
        )
        return (
            s.crossJoin(v)
            .select(F.expr(h).alias("h"), "s")
            .groupBy("h")
            .agg(F.min("s").alias("shard"))
        )

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_H32_SPARK.format(s="cast(doc_id as string)")).alias("pos"),
    )

    def assign(ring_df):
        return (
            docs.crossJoin(F.broadcast(ring_df))
            .groupBy("doc_id", "pos")
            .agg(
                F.coalesce(
                    F.min(
                        F.when(F.col("h") >= F.col("pos"), F.col("h"))
                    ),
                    F.min("h"),
                ).alias("chosen_h")
            )
        )

    ring_a, ring_b = ring(_CH_SHARDS_BEFORE), ring(_CH_SHARDS_BEFORE + 1)
    a = assign(ring_a).join(
        F.broadcast(ring_a.withColumnRenamed("shard", "shard_a")),
        F.col("chosen_h") == F.col("h"),
    ).select("doc_id", "pos", "shard_a")
    b = assign(ring_b).join(
        F.broadcast(ring_b.withColumnRenamed("shard", "shard_b")),
        F.col("chosen_h") == F.col("h"),
    ).select(F.col("doc_id").alias("doc_id_b"), "shard_b")
    consistent = (
        a.join(b, a["doc_id"] == b["doc_id_b"])
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("shard_a") != F.col("shard_b"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_moved"),
        )
        .select(F.lit("consistent").alias("strategy"), "n_docs", "n_moved")
    )
    naive = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.when(
                F.col("pos") % _CH_SHARDS_BEFORE
                != F.col("pos") % (_CH_SHARDS_BEFORE + 1),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_moved"),
    ).select(F.lit("mod").alias("strategy"), "n_docs", "n_moved")
    return consistent.unionAll(naive).select(
        "strategy",
        "n_docs",
        "n_moved",
        F.expr("CAST((1000000 * n_moved) div n_docs AS BIGINT)").alias(
            "moved_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# Columnar encoding audit: RLE runs + dictionary size per layout
# ---------------------------------------------------------------------------


@register(
    "encoding_rle_audit",
    """
    WITH li AS (
      SELECT l_orderkey, l_linenumber, l_returnflag AS rf, l_linestatus AS ls,
             CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT) AS day
      FROM lineitem
    ), cols AS (
      SELECT 'returnflag' AS col, CAST(rf AS VARCHAR) AS v,
             l_orderkey AS o1, l_linenumber AS o2 FROM li
      UNION ALL
      SELECT 'linestatus', CAST(ls AS VARCHAR), l_orderkey, l_linenumber
      FROM li
      UNION ALL
      SELECT 'shipday', CAST(day AS VARCHAR), l_orderkey, l_linenumber
      FROM li
    ), runs AS (
      -- (l_orderkey, l_linenumber) is NOT unique in the synthetic data,
      -- so the value itself is the deterministic tiebreaker: rows tied on
      -- the natural key sort their values adjacently in both engines,
      -- which pins the run count
      SELECT col, ord,
             CASE WHEN v = LAG(v) OVER (PARTITION BY col, ord
                                        ORDER BY k1, k2, v, k3)
                  THEN 0 ELSE 1 END AS is_run_start
      FROM (
        SELECT col, v, 'natural' AS ord,
               o1 AS k1, o2 AS k2, CAST(0 AS BIGINT) AS k3 FROM cols
        UNION ALL
        SELECT col, v, 'sorted', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
               ROW_NUMBER() OVER (PARTITION BY col ORDER BY v, o1, o2)
        FROM cols
      )
    ), dict AS (
      SELECT col, CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM cols GROUP BY col
    )
    SELECT r.col, r.ord,
           d.n_rows, d.n_distinct,
           CAST(SUM(r.is_run_start) AS BIGINT) AS n_runs,
           CAST((1000000 * SUM(r.is_run_start)) // d.n_rows AS BIGINT)
             AS runs_per_row_ppm
    FROM runs r JOIN dict d USING (col)
    GROUP BY r.col, r.ord, d.n_rows, d.n_distinct
    """,
    "Columnar encoding audit — the RLE/dictionary sizing every "
    "Parquet writer decides per column chunk: for three lineitem "
    "columns (returnflag, linestatus, ship day), count the RLE runs "
    "the column produces under its NATURAL row order vs fully SORTED "
    "order, alongside dictionary cardinality — runs_per_row near 1e6 "
    "means RLE is useless (natural-order low-cardinality columns "
    "interleave), near n_distinct/n_rows means sorting made the "
    "column almost free to store. This is zonemap_skip_stats' "
    "sibling on the STORAGE axis: the same sort-on-write decision, "
    "measured in encoding runs instead of skipped files. Run starts "
    "are one LAG window per (column, layout); the sorted layout is "
    "simulated by a per-column rank (production writers sort within "
    "row groups).",
)
def encoding_rle_audit(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import ts_micros

    raw = t(spark, sf_dir, "lineitem")
    sd_dtype = dict(raw.dtypes).get("l_shipdate", "")
    li = raw.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_returnflag").alias("rf"),
        F.col("l_linestatus").alias("ls"),
        F.expr(
            f"({ts_micros(sd_dtype, 'l_shipdate')._jc.toString()})"
        ).alias("_us"),
    ).select(
        "l_orderkey",
        "l_linenumber",
        "rf",
        "ls",
        F.expr("CAST(_us div 86400000000 AS BIGINT)").alias("day"),
    )
    cols = (
        li.select(
            F.lit("returnflag").alias("col"),
            F.col("rf").cast("string").alias("v"),
            F.col("l_orderkey").alias("o1"),
            F.col("l_linenumber").alias("o2"),
        )
        .unionAll(
            li.select(
                F.lit("linestatus").alias("col"),
                F.col("ls").cast("string").alias("v"),
                F.col("l_orderkey").alias("o1"),
                F.col("l_linenumber").alias("o2"),
            )
        )
        .unionAll(
            li.select(
                F.lit("shipday").alias("col"),
                F.col("day").cast("string").alias("v"),
                F.col("l_orderkey").alias("o1"),
                F.col("l_linenumber").alias("o2"),
            )
        )
    )
    wsort = W.partitionBy("col").orderBy("v", "o1", "o2")
    stacked = cols.select(
        "col",
        "v",
        F.lit("natural").alias("ord"),
        F.col("o1").alias("k1"),
        F.col("o2").cast("long").alias("k2"),
        F.lit(0).cast("long").alias("k3"),
    ).unionAll(
        cols.select(
            "col",
            "v",
            F.lit("sorted").alias("ord"),
            F.lit(0).cast("long").alias("k1"),
            F.lit(0).cast("long").alias("k2"),
            F.row_number().over(wsort).cast("long").alias("k3"),
        )
    )
    wlag = W.partitionBy("col", "ord").orderBy("k1", "k2", "v", "k3")
    runs = stacked.select(
        "col",
        "ord",
        F.when(F.col("v") == F.lag("v").over(wlag), 0)
        .otherwise(1)
        .alias("is_run_start"),
    )
    dict_df = cols.groupBy("col").agg(
        F.countDistinct("v").cast("long").alias("n_distinct"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    return (
        runs.groupBy("col", "ord")
        .agg(F.sum("is_run_start").cast("long").alias("n_runs"))
        .join(F.broadcast(dict_df), "col")
        .select(
            "col",
            "ord",
            "n_rows",
            "n_distinct",
            "n_runs",
            F.expr(
                "CAST((1000000 * n_runs) div n_rows AS BIGINT)"
            ).alias("runs_per_row_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Grid-blocked spatial self-join
# ---------------------------------------------------------------------------

_GEO_SPAN = 1000000      # plane edge (scaled integer units)
_GEO_CELL = 100000       # grid cell edge; radius <= cell guarantees 3x3
_GEO_R = 80000           # join radius
_GEO_R2 = _GEO_R * _GEO_R


@register(
    "geo_grid_spatial_join",
    f"""
    WITH pts AS (
      SELECT user_id,
             {_H32_DUCK.format(s="'x:' || CAST(user_id AS VARCHAR)")}
               % {_GEO_SPAN} AS x,
             {_H32_DUCK.format(s="'y:' || CAST(user_id AS VARCHAR)")}
               % {_GEO_SPAN} AS y
      FROM (SELECT DISTINCT user_id FROM events)
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           CAST((a.x - b.x) * (a.x - b.x)
              + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist2
    FROM pts a JOIN pts b
      ON a.user_id < b.user_id
     AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
         <= {_GEO_R2}
    """,
    "Grid-blocked spatial self-join — the uniform-grid algorithm "
    "behind every distance join (PostGIS ST_DWithin tiling, Sedona's "
    "partitioned spatial join): each user gets a deterministic "
    "hash-derived point on a 1e6-unit integer plane, and pairs within "
    "radius 80k are found by probing each point's 3x3 CELL "
    "NEIGHBORHOOD (cell edge >= radius makes the neighborhood "
    "sufficient, proven by the oracle) with an equi-join on cell "
    "coordinates + the exact integer distance filter. Each unordered "
    "pair is emitted exactly once: only the probe side with the "
    "smaller user id keeps its match. The oracle replays the "
    "quadratic DEFINITION (self-join + distance predicate) — "
    "independent algorithms, identical output. At 100 TB the grid "
    "equi-join shuffles each point 9x into dimension-bounded cells "
    "instead of comparing all pairs; skewed cells salt like any "
    "hot-key join.",
)
def geo_grid_spatial_join(spark, sf_dir):
    users = t(spark, sf_dir, "events").select("user_id").distinct()
    pts = users.select(
        "user_id",
        (
            F.expr(
                _H32_SPARK.format(s="concat('x:', cast(user_id as string))")
            )
            % _GEO_SPAN
        ).alias("x"),
        (
            F.expr(
                _H32_SPARK.format(s="concat('y:', cast(user_id as string))")
            )
            % _GEO_SPAN
        ).alias("y"),
    )
    home = pts.select(
        F.col("user_id").alias("ub"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.expr(f"x div {_GEO_CELL}").alias("cx"),
        F.expr(f"y div {_GEO_CELL}").alias("cy"),
    )
    probes = pts.select(
        F.col("user_id").alias("ua"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(-1, 1), i ->
                      transform(sequence(-1, 1), j ->
                        struct(x div {_GEO_CELL} + i AS cx,
                               y div {_GEO_CELL} + j AS cy))))"""
            )
        ).alias("c"),
    ).select("ua", "xa", "ya", F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"))
    return (
        probes.join(home, ["cx", "cy"])
        .where(F.col("ua") < F.col("ub"))
        .where(
            (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
            + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
            <= _GEO_R2
        )
        .select(
            F.col("ua").alias("user_a"),
            F.col("ub").alias("user_b"),
            (
                (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
                + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
            )
            .cast("long")
            .alias("dist2"),
        )
    )


# ---------------------------------------------------------------------------
# Temporal (time-respecting) reachability
# ---------------------------------------------------------------------------

_TR_ROUNDS = 4
_TR_SEED_MOD = 20
_TR_BUCKET_US = 600000000  # 10-minute co-occurrence buckets


def _temporal_oracle() -> str:
    """Unrolled time-respecting relaxation. MATERIALIZED rounds: each
    references the previous arrival vector twice (carry + relax)."""
    steps = []
    for i in range(1, _TR_ROUNDS + 1):
        steps.append(f"""
    a{i} AS MATERIALIZED (
      SELECT node, MIN(arrival) AS arrival FROM (
        SELECT node, arrival FROM a{i - 1}
        UNION ALL
        SELECT e.dst AS node, e.b AS arrival
        FROM edges e JOIN a{i - 1} p ON p.node = e.src AND p.arrival <= e.b
      ) GROUP BY node
    )""")
    return f"""
    WITH b AS MATERIALIZED (
      SELECT DISTINCT user_id, event_type,
             epoch_us(ts) // {_TR_BUCKET_US} AS bk
      FROM events
    ), und AS (
      SELECT x.user_id AS u, y.user_id AS v, x.bk AS b
      FROM b x JOIN b y
        ON x.event_type = y.event_type AND x.bk = y.bk
       AND x.user_id < y.user_id
      GROUP BY 1, 2, 3
    ), edges AS MATERIALIZED (
      SELECT u AS src, v AS dst, b FROM und
      UNION ALL SELECT v, u, b FROM und
    ), a0 AS MATERIALIZED (
      SELECT DISTINCT user_id AS node, CAST(0 AS BIGINT) AS arrival
      FROM events WHERE user_id % {_TR_SEED_MOD} = 0
    ),
    {','.join(steps)}
    SELECT node AS user_id, CAST(arrival AS BIGINT) AS arrival_bucket
    FROM a{_TR_ROUNDS}
    """


@register(
    "graph_temporal_reachability",
    _temporal_oracle(),
    "Time-respecting reachability (Kempe, Kleinberg & Kumar 2000 "
    "temporal paths): users co-occurring in the same 10-minute "
    "activity bucket are linked AT that bucket's time, and influence "
    "from seed users (id % 20 == 0) spreads only along edges whose "
    "time is >= the arrival time at the source — the contact-tracing "
    "/ information-diffusion primitive a static BFS gets WRONG "
    "(static paths can ride edges that fired before the source was "
    "reached). Four fixed relaxation rounds, each one equi-join of "
    "the arrival vector onto the timed edge list + a MIN aggregate; "
    "arrivals are monotone nonincreasing so the unrolled oracle "
    "replays the exact same prefix regardless of convergence. "
    "At 100 TB: the timed edge list shuffles once, rounds reuse it "
    "(localCheckpoint lineage cuts, the pagerank doctrine).",
)
def graph_temporal_reachability(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    b = ev.select(
        "user_id",
        "event_type",
        F.expr(f"(ts div 1000) div {_TR_BUCKET_US}").alias("bk"),
    ).distinct()
    x, y = b.alias("x"), b.alias("y")
    und = (
        x.join(
            y,
            (F.col("x.event_type") == F.col("y.event_type"))
            & (F.col("x.bk") == F.col("y.bk"))
            & (F.col("x.user_id") < F.col("y.user_id")),
        )
        .select(
            F.col("x.user_id").alias("u"),
            F.col("y.user_id").alias("v"),
            F.col("x.bk").alias("b"),
        )
        .distinct()
    )
    edges = und.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "b"
    ).unionAll(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"), "b")
    ).localCheckpoint(eager=False)
    arrivals = (
        ev.where(F.col("user_id") % _TR_SEED_MOD == 0)
        .select(F.col("user_id").alias("node"))
        .distinct()
        .select("node", F.lit(0).cast("long").alias("arrival"))
        .localCheckpoint(eager=False)
    )
    for _ in range(_TR_ROUNDS):
        relaxed = (
            edges.join(arrivals, edges["src"] == arrivals["node"])
            .where(F.col("arrival") <= F.col("b"))
            .select(F.col("dst").alias("node"), F.col("b").alias("arrival"))
        )
        arrivals = (
            arrivals.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("arrival").alias("arrival"))
            .localCheckpoint(eager=False)
        )
    return arrivals.select(
        F.col("node").alias("user_id"),
        F.col("arrival").cast("long").alias("arrival_bucket"),
    )


# ---------------------------------------------------------------------------
# Range-partitioner boundary quality audit
# ---------------------------------------------------------------------------

_RP_PARTS = 32
_RP_SAMPLE_MOD = 100


@register(
    "range_partition_balance",
    f"""
    WITH x AS (
      SELECT l_partkey AS v,
             {_H32_DUCK.format(
                 s="CAST(l_orderkey AS VARCHAR) || ':' || "
                   "CAST(l_linenumber AS VARCHAR) || ':' || "
                   "CAST(l_partkey AS VARCHAR)")} AS h
      FROM lineitem
    ), samp AS (
      SELECT v, ROW_NUMBER() OVER (ORDER BY v, h) AS rn,
             COUNT(*) OVER () AS ns
      FROM x WHERE h % {_RP_SAMPLE_MOD} = 0
    ), bounds AS (
      SELECT v AS cut
      FROM samp
      WHERE rn IN (SELECT ((i * ns) // {_RP_PARTS})
                   FROM (SELECT unnest(range(1, {_RP_PARTS})) AS i),
                        (SELECT MAX(ns) AS ns FROM samp))
      GROUP BY v
    ), assigned AS (
      SELECT x.v,
             (SELECT COUNT(*) FROM bounds b WHERE b.cut < x.v) AS part
      FROM x
    ), sizes AS (
      SELECT part, CAST(COUNT(*) AS BIGINT) AS n FROM assigned GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts_used,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(MAX(n) AS BIGINT) AS max_rows,
           CAST(MIN(n) AS BIGINT) AS min_rows,
           CAST((1000000 * MAX(n) * COUNT(*)) // SUM(n) AS BIGINT)
             AS imbalance_ppm,
           (SELECT CAST(MAX(ns) AS BIGINT) FROM samp) AS sample_rows
    FROM sizes
    """,
    "Range-partitioner boundary quality audit — what Spark's "
    "RangePartitioner does before every sort/repartitionByRange, made "
    "measurable: a deterministic ~1% hash sample of lineitem part "
    "keys yields 31 equi-depth cut points, the FULL table is assigned "
    "by boundary rank (count of cuts below the value), and the audit "
    "reports max/min partition sizes and the straggler factor "
    "(max-over-mean ppm) the sampled boundaries actually deliver — "
    "the number that decides whether a sample rate is safe before a "
    "100 TB global sort. Duplicate cut values collapse (GROUP BY), so "
    "heavy keys that defeat range splitting surface as used-partition "
    "loss, exactly like the real partitioner.",
)
def range_partition_balance(spark, sf_dir):
    x = t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("v"),
        F.expr(
            _H32_SPARK.format(
                s="concat(cast(l_orderkey as string), ':', "
                "cast(l_linenumber as string), ':', "
                "cast(l_partkey as string))"
            )
        ).alias("h"),
    )
    samp = x.where(F.col("h") % _RP_SAMPLE_MOD == 0)
    ws = W.orderBy("v", "h")
    sr = samp.select(
        "v",
        F.row_number().over(ws).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("ns"),
    )
    ranks = spark.range(1, _RP_PARTS).select(F.col("id").alias("i"))
    bounds = (
        sr.crossJoin(F.broadcast(ranks))
        .where(F.col("rn") == F.expr(f"(i * ns) div {_RP_PARTS}"))
        .select(F.col("v").alias("cut"))
        .distinct()
    )
    # the 31 cuts ride along as ONE broadcast array; each row ranks
    # itself map-side (count of cuts below the value). A join+group
    # formulation would collapse duplicate rows — (orderkey, linenumber)
    # is not unique in the synthetic data — and undercount.
    cuts = bounds.agg(F.sort_array(F.collect_list("cut")).alias("cuts"))
    assigned = (
        x.crossJoin(F.broadcast(cuts))
        .select(
            F.size(
                F.filter("cuts", lambda c: c < F.col("v"))
            ).alias("part")
        )
    )
    sizes = assigned.groupBy("part").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    sample_rows = samp.agg(
        F.count(F.lit(1)).cast("long").alias("sample_rows")
    )
    return (
        sizes.agg(
            F.count(F.lit(1)).cast("long").alias("n_parts_used"),
            F.sum("n").cast("long").alias("n_rows"),
            F.max("n").cast("long").alias("max_rows"),
            F.min("n").cast("long").alias("min_rows"),
            F.expr(
                "CAST((1000000 * MAX(n) * COUNT(*)) div SUM(n) AS BIGINT)"
            ).alias("imbalance_ppm"),
        )
        .crossJoin(F.broadcast(sample_rows))
    )


# ---------------------------------------------------------------------------
# l-diversity audit (companion to privacy_k_anonymity)
# ---------------------------------------------------------------------------

_LDIV_L = 3
_LDIV_BAND_C = 200000


@register(
    "privacy_l_diversity",
    f"""
    WITH c AS (
      SELECT c_nationkey AS nat, c_mktsegment AS seg,
             (CAST(ROUND(c_acctbal * 100) AS BIGINT) + {_ER_SHIFT_C})
               // {_LDIV_BAND_C} AS sens
      FROM customer
    )
    SELECT nat, seg,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT sens) AS BIGINT) AS l_distinct,
           CAST(CASE WHEN COUNT(DISTINCT sens) >= {_LDIV_L}
                THEN 1 ELSE 0 END AS BIGINT) AS satisfies_l
    FROM c GROUP BY nat, seg
    """,
    "l-diversity audit (Machanavajjhala et al. 2007) — the "
    "k-anonymity companion that catches the homogeneity attack "
    "k-anonymity misses: per quasi-identifier group (nation, "
    "segment), count DISTINCT sensitive values (shifted-positive "
    "balance bands) and flag groups below l=3, where every member's "
    "sensitive value is effectively disclosed even though the group "
    "is large. One grouped distinct-count; the release decision "
    "then suppresses or generalizes the failing groups "
    "(privacy_k_anonymity's machinery).",
)
def privacy_l_diversity(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import cents

    c = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.expr(
            f"(CAST(ROUND(c_acctbal * 100) AS BIGINT) + {_ER_SHIFT_C}) "
            f"div {_LDIV_BAND_C}"
        ).alias("sens"),
    )
    return c.groupBy("nat", "seg").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.countDistinct("sens").cast("long").alias("l_distinct"),
        F.when(F.countDistinct("sens") >= _LDIV_L, 1)
        .otherwise(0)
        .cast("long")
        .alias("satisfies_l"),
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust slope (median of pairwise slopes)
# ---------------------------------------------------------------------------

_TS_MAX_EVENTS = 20


@register(
    "regr_theil_sen",
    f"""
    WITH r AS (
      SELECT user_id, epoch_us(ts) AS tu,
             CAST(ROUND(value * 100) AS BIGINT) AS v,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS rn
      FROM events
    ), w AS (
      SELECT * FROM r WHERE rn <= {_TS_MAX_EVENTS}
    ), slopes AS (
      -- integer truncating division on a signed numerator: DuckDB's //
      -- on BIGINT truncates toward zero, matching Spark's div (NOT
      -- Python's floor //)
      SELECT a.user_id,
             (1000000 * (b.v - a.v)) // (b.tu - a.tu) AS slope_ppm
      FROM w a JOIN w b
        ON a.user_id = b.user_id AND a.rn < b.rn AND b.tu > a.tu
    ), med AS (
      SELECT user_id, slope_ppm,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY slope_ppm, slope_ppm) AS mrn,
             COUNT(*) OVER (PARTITION BY user_id) AS np
      FROM slopes
    )
    SELECT user_id, CAST(MAX(np) AS BIGINT) AS n_pairs,
           CAST(MAX(CASE WHEN mrn = (np + 1) // 2 THEN slope_ppm END)
                AS BIGINT) AS theil_sen_ppm
    FROM med GROUP BY user_id
    """,
    "Theil-Sen robust slope estimator (the median of all pairwise "
    "slopes; Sen 1968) for each user's value-over-time trend — "
    "resistant to the outliers that wreck the OLS fit in "
    "a24_regr_fit, which is exactly why robust monitors use it. "
    "Pairs come from the first 20 events per user (the pass@k "
    "capping discipline: the quadratic pair count is bounded at "
    "190/user at ANY corpus scale), slopes are integer ppm with "
    "truncating division spelled identically in both engines, "
    "equal-timestamp pairs are excluded (undefined slope), and the "
    "median is the lower order statistic — deterministic, no "
    "averaging of middle pairs.",
)
def regr_theil_sen(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import cents

    r = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("ts div 1000").alias("tu"),
        cents("value").alias("v"),
    )
    wr = W.partitionBy("user_id").orderBy("tu", "event_id")
    w = (
        r.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") <= _TS_MAX_EVENTS)
        .select("user_id", "tu", "v", "rn")
    )
    a, b = w.alias("a"), w.alias("b")
    slopes = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.rn") < F.col("b.rn"))
        & (F.col("b.tu") > F.col("a.tu")),
    ).select(
        F.col("a.user_id").alias("user_id"),
        F.expr(
            "(1000000 * (b.v - a.v)) div (b.tu - a.tu)"
        ).alias("slope_ppm"),
    )
    wm = W.partitionBy("user_id").orderBy("slope_ppm")
    med = slopes.select(
        "user_id",
        "slope_ppm",
        F.row_number().over(wm).alias("mrn"),
        F.count(F.lit(1)).over(W.partitionBy("user_id")).alias("np"),
    )
    return med.groupBy("user_id").agg(
        F.max("np").cast("long").alias("n_pairs"),
        F.max(
            F.when(F.col("mrn") == F.expr("(np + 1) div 2"), F.col("slope_ppm"))
        )
        .cast("long")
        .alias("theil_sen_ppm"),
    )


# ---------------------------------------------------------------------------
# Largest-remainder quota allocation
# ---------------------------------------------------------------------------

_QUOTA_SLOTS = 1000


@register(
    "quota_largest_remainder",
    f"""
    WITH d AS (
      SELECT source, CAST(SUM(len({_TOKS_SQL})) AS BIGINT) AS toks
      FROM documents GROUP BY source
    ), tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS total FROM d),
    base AS (
      SELECT d.source, d.toks,
             ({_QUOTA_SLOTS} * d.toks) // tot.total AS base,
             ({_QUOTA_SLOTS} * d.toks) % tot.total AS rem
      FROM d, tot
    ), leftover AS (
      SELECT CAST({_QUOTA_SLOTS} - SUM(base) AS BIGINT) AS extra FROM base
    ), ranked AS (
      SELECT source, toks, base, rem,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
      FROM base
    )
    SELECT r.source, r.toks, CAST(r.base AS BIGINT) AS base_alloc,
           CAST(CASE WHEN r.rk <= l.extra THEN 1 ELSE 0 END AS BIGINT)
             AS extra_slot,
           CAST(r.base + CASE WHEN r.rk <= l.extra THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM ranked r, leftover l
    """,
    "Largest-remainder (Hamilton) quota allocation: 1000 sampling "
    "slots apportioned across document sources proportionally to "
    "their token mass — floor shares first, then the leftover slots "
    "go to the largest remainders (ties to the lexicographically "
    "smaller source). This is the exact-integer apportionment every "
    "mixture-sampling plan needs once corpus_budget_select has picked "
    "WHAT to keep: allocations always sum to exactly the slot budget "
    "(no float drift, no re-normalization pass), which the behavioral "
    "test asserts. Dimension-sized end to end after one token "
    "aggregate.",
)
def quota_largest_remainder(spark, sf_dir):
    d = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(_toks_a())).cast("long").alias("toks"))
    )
    tot = d.agg(F.sum("toks").cast("long").alias("total"))
    base = d.crossJoin(F.broadcast(tot)).select(
        "source",
        "toks",
        F.expr(f"({_QUOTA_SLOTS} * toks) div total").alias("base"),
        F.expr(f"({_QUOTA_SLOTS} * toks) % total").alias("rem"),
    )
    leftover = base.agg(
        (F.lit(_QUOTA_SLOTS) - F.sum("base")).cast("long").alias("extra")
    )
    wr = W.orderBy(F.desc("rem"), F.asc("source"))
    ranked = base.withColumn("rk", F.row_number().over(wr))
    return ranked.crossJoin(F.broadcast(leftover)).select(
        "source",
        "toks",
        F.col("base").cast("long").alias("base_alloc"),
        F.when(F.col("rk") <= F.col("extra"), 1)
        .otherwise(0)
        .cast("long")
        .alias("extra_slot"),
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("extra"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    )


# ---------------------------------------------------------------------------
# Hash-quality collision audit
# ---------------------------------------------------------------------------

_HC_BITS = 16
_HC_DOMAIN = 1 << _HC_BITS


@register(
    "hash_collision_audit",
    f"""
    WITH e AS (
      SELECT DISTINCT CAST(event_id AS VARCHAR) AS s FROM events
    ), h AS (
      SELECT {_H32_DUCK.format(s="s")} % {_HC_DOMAIN} AS h16 FROM e
    ), g AS (
      SELECT h16, CAST(COUNT(*) AS BIGINT) AS c FROM h GROUP BY 1
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e)
    SELECT n.n,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_h,
           CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS colliding_pairs,
           CAST((n.n * (n.n - 1) // 2) // {_HC_DOMAIN} AS BIGINT)
             AS expected_pairs
    FROM g, n GROUP BY n.n
    """,
    "Hash-quality collision audit: every event id hashed into a "
    "DELIBERATELY small 16-bit domain, actual colliding pairs "
    "(sum of C(c,2) over hash buckets) reported against the birthday "
    "bound n(n-1)/2/65536 — the audit run before trusting a "
    "fingerprint width for dedup keys or shuffle buckets (the md5-32 "
    "prefix used across this engine passes at 32 bits; truncating to "
    "16 shows exactly the collision mass the bound predicts). One "
    "hash aggregate over distinct ids; all integer.",
)
def hash_collision_audit(spark, sf_dir):
    e = (
        t(spark, sf_dir, "events")
        .select(F.col("event_id").cast("string").alias("s"))
        .distinct()
    )
    h = e.select(
        (F.expr(_H32_SPARK.format(s="s")) % _HC_DOMAIN).alias("h16")
    )
    g = h.groupBy("h16").agg(F.count(F.lit(1)).cast("long").alias("c"))
    n = e.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        g.crossJoin(F.broadcast(n))
        .groupBy("n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_h"),
            F.sum(F.expr("c * (c - 1) div 2")).cast("long").alias(
                "colliding_pairs"
            ),
            F.expr(
                f"CAST((MAX(n) * (MAX(n) - 1) div 2) div {_HC_DOMAIN} "
                "AS BIGINT)"
            ).alias("expected_pairs"),
        )
    )


# ---------------------------------------------------------------------------
# Kendall tau distance between two rankings
# ---------------------------------------------------------------------------

_KT_TOP = 50


@register(
    "eval_kendall_tau",
    f"""
    WITH d AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS sa,
             CAST(100 * len(list_distinct({_TOKS_SQL})) AS BIGINT) AS sb
      FROM documents
    ), top AS (
      SELECT doc_id, sa, sb
      FROM d ORDER BY sa DESC, doc_id LIMIT {_KT_TOP}
    ), ranked AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY sa DESC, doc_id) AS ra,
             ROW_NUMBER() OVER (ORDER BY sb DESC, doc_id) AS rb
      FROM top
    ), pairs AS (
      SELECT CASE WHEN (a.ra < b.ra) <> (a.rb < b.rb)
             THEN 1 ELSE 0 END AS disc
      FROM ranked a JOIN ranked b ON a.doc_id < b.doc_id
    )
    SELECT CAST({_KT_TOP} AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(disc) AS BIGINT) AS n_discordant,
           CAST((1000000 * (COUNT(*) - 2 * SUM(disc))) // COUNT(*)
                AS BIGINT) AS tau_ppm
    FROM pairs
    """,
    "Kendall tau rank correlation between two retrieval signals "
    "(char-length vs lexical-richness rankings of the top-50 docs): "
    "discordant pairs counted exactly, tau = (concordant - "
    "discordant) / pairs in integer ppm — the ranking-agreement "
    "number behind judge-vs-judge and reranker-vs-baseline evals, "
    "where Spearman/Pearson on float scores would be "
    "engine-dependent. Both rankings use strict row_number with "
    "doc_id tie-break, so concordance is total and the pair "
    "comparison is pure integer logic; the top-50 cap bounds the "
    "quadratic pair count at any corpus scale (the Theil-Sen / "
    "pass@k capping discipline).",
)
def eval_kendall_tau(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("sa"),
        (100 * F.size(F.array_distinct(_toks_a()))).cast("long").alias("sb"),
    )
    top = d.orderBy(F.desc("sa"), F.asc("doc_id")).limit(_KT_TOP)
    wa = W.orderBy(F.desc("sa"), F.asc("doc_id"))
    wb = W.orderBy(F.desc("sb"), F.asc("doc_id"))
    ranked = top.select(
        "doc_id",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"),
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    pairs = a.join(b, F.col("a.doc_id") < F.col("b.doc_id")).select(
        F.when(
            (F.col("a.ra") < F.col("b.ra")) != (F.col("a.rb") < F.col("b.rb")),
            1,
        )
        .otherwise(0)
        .alias("disc")
    )
    return pairs.agg(
        F.lit(_KT_TOP).cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("disc").cast("long").alias("n_discordant"),
        F.expr(
            "CAST((1000000 * (COUNT(*) - 2 * SUM(disc))) div COUNT(*) "
            "AS BIGINT)"
        ).alias("tau_ppm"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit forensic audit
# ---------------------------------------------------------------------------

# log10(1 + 1/d) in ppm, rounded — constants, not computed (cross-engine
# float logs are not bit-stable)
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
_BENFORD_VALUES = ", ".join(
    f"({d}, {p})" for d, p in _BENFORD_PPM.items()
)


@register(
    "dq_benford_digits",
    f"""
    WITH v AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem
      WHERE l_extendedprice > 0
    ), fd AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM v
    ), cnt AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS total
      FROM fd GROUP BY digit
    ), bf(digit, benford_ppm) AS (VALUES {_BENFORD_VALUES})
    SELECT b.digit, COALESCE(c.n, 0) AS n,
           CAST((1000000 * COALESCE(c.n, 0)) // MAX(c2.total) AS BIGINT)
             AS actual_ppm,
           CAST(b.benford_ppm AS BIGINT) AS benford_ppm,
           CAST(abs((1000000 * COALESCE(c.n, 0)) // MAX(c2.total)
                    - b.benford_ppm) AS BIGINT) AS abs_dev_ppm
    FROM bf b
    LEFT JOIN cnt c ON c.digit = b.digit, (SELECT total FROM cnt LIMIT 1) c2(total)
    GROUP BY b.digit, c.n, b.benford_ppm
    """,
    "Benford first-digit forensic audit (Newcomb 1881 / Benford "
    "1938) over positive price cents — the fraud/synthetic-data "
    "screen auditors run on financial columns: per leading digit, "
    "actual frequency in ppm against the Benford expectation, with "
    "the expectations as INTEGER LITERALS (cross-engine float log10 "
    "is not bit-stable; the constants are). TPC-H uniform prices "
    "FAIL Benford loudly — which is the point: the audit detects "
    "non-naturally-distributed columns, and the behavioral test "
    "pins that signature. One digit aggregate + a 9-row literal "
    "spine.",
)
def dq_benford_digits(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import cents

    v = (
        t(spark, sf_dir, "lineitem")
        .where(F.col("l_extendedprice") > 0)
        .select(cents("l_extendedprice").alias("c"))
    )
    fd = v.select(
        F.substring(F.col("c").cast("string"), 1, 1).cast("long").alias("digit")
    )
    cnt = fd.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    total = fd.agg(F.count(F.lit(1)).cast("long").alias("total"))
    bf = spark.createDataFrame(
        sorted(_BENFORD_PPM.items()), "digit long, benford_ppm long"
    )
    return (
        bf.join(cnt, "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.expr(
                "CAST((1000000 * COALESCE(n, 0)) div total AS BIGINT)"
            ).alias("actual_ppm"),
            F.col("benford_ppm").cast("long").alias("benford_ppm"),
            F.expr(
                "CAST(abs((1000000 * COALESCE(n, 0)) div total "
                "- benford_ppm) AS BIGINT)"
            ).alias("abs_dev_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-source quantile normalization
# ---------------------------------------------------------------------------


@register(
    "feature_quantile_normalize",
    f"""
    WITH d AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS v FROM documents
    ), src AS (
      SELECT doc_id, source, v,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY v, doc_id)
               AS r,
             COUNT(*) OVER (PARTITION BY source) AS ns
      FROM d
    ), pooled AS (
      SELECT v AS ref_v,
             ROW_NUMBER() OVER (ORDER BY v, doc_id) AS g,
             COUNT(*) OVER () AS n
      FROM d
    )
    SELECT s.doc_id, s.source, s.v AS orig_chars,
           p.ref_v AS norm_chars
    FROM src s JOIN pooled p
      ON p.g = (s.r * p.n + s.ns - 1) // s.ns
    """,
    "Cross-source quantile normalization (the microarray-era "
    "technique feature pipelines still use to make per-source "
    "distributions comparable): each document's char length is "
    "replaced by the POOLED distribution's value at the same "
    "quantile — rank r of n_s within its source maps to pooled rank "
    "ceil(r*N/n_s), all integer rank arithmetic, strict (value, "
    "doc_id) orders so both engines agree on every tie. After this, "
    "a length threshold means the same thing for every source — the "
    "prerequisite for fair per-source quality gates. One window per "
    "side + one equi-join on the computed rank.",
)
def feature_quantile_normalize(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("v")
    )
    ws = W.partitionBy("source").orderBy("v", "doc_id")
    src = d.select(
        "doc_id",
        "source",
        "v",
        F.row_number().over(ws).alias("r"),
        F.count(F.lit(1)).over(W.partitionBy("source")).alias("ns"),
    )
    wg = W.orderBy("v", "doc_id")
    pooled = d.select(
        F.col("v").alias("ref_v"),
        F.row_number().over(wg).alias("g"),
    )
    n = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    # target rank computed src-side (1-row count append) so the pooled
    # lookup stays an EQUI-join — a mixed-side rank expression would
    # plan as an unbounded nested-loop join
    tgt = src.crossJoin(F.broadcast(n)).select(
        "doc_id",
        "source",
        "v",
        F.expr("(r * n + ns - 1) div ns").alias("g"),
    )
    return tgt.join(pooled, "g").select(
        "doc_id",
        "source",
        F.col("v").alias("orig_chars"),
        F.col("ref_v").alias("norm_chars"),
    )


# ---------------------------------------------------------------------------
# Shannon-code compression bound audit
# ---------------------------------------------------------------------------


@register(
    "token_shannon_code_audit",
    f"""
    WITH tk AS (
      SELECT unnest({_TOKS_SQL}) AS tok FROM documents
    ), cnt AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tk GROUP BY tok
    ), tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS vocab
      FROM cnt
    ), coded AS (
      SELECT cnt.tok, cnt.c,
             CASE WHEN (tot.total + cnt.c - 1) // cnt.c <= 1 THEN 1
                  ELSE length(bin((tot.total + cnt.c - 1) // cnt.c - 1))
             END AS code_bits,
             CASE WHEN tot.vocab <= 1 THEN 1
                  ELSE length(bin(tot.vocab - 1)) END AS fixed_bits,
             tot.total
      FROM cnt, tot
    )
    SELECT tok, c,
           CAST(code_bits AS BIGINT) AS code_bits,
           CAST(c * code_bits AS BIGINT) AS weighted_bits,
           CAST(fixed_bits AS BIGINT) AS fixed_bits,
           CAST(c * fixed_bits AS BIGINT) AS fixed_weighted_bits
    FROM coded
    """,
    "Shannon-code compression bound audit: per corpus token, the "
    "integer Shannon code length ceil(log2(total/count)) — computed "
    "EXACTLY as length(bin(ceil(total/c) - 1)), which both engines "
    "evaluate bit-identically, no float log2 — against the "
    "fixed-length ceil(log2 V) baseline, with frequency-weighted bit "
    "totals per token. Kraft-valid by construction (L >= log2(1/p)); "
    "summing weighted_bits vs fixed_weighted_bits reads off whether "
    "a frequency-aware token encoding pays AT ALL — on this corpus' "
    "near-uniform vocabulary the ceiling overhead actually LOSES to "
    "fixed-length (the behavioral test pins both regimes with a "
    "skewed crafted corpus), which is exactly the go/no-go the audit "
    "exists to answer before anyone ships dictionary coding. "
    "Companion to encoding_rle_audit on the value-stream side; one "
    "vocabulary aggregate + a 1-row totals append.",
)
def token_shannon_code_audit(spark, sf_dir):
    tk = t(spark, sf_dir, "documents").select(
        F.explode(_toks_a()).alias("tok")
    )
    cnt = tk.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = cnt.agg(
        F.sum("c").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "tok",
            "c",
            F.expr(
                "CAST(CASE WHEN (total + c - 1) div c <= 1 THEN 1 "
                "ELSE length(bin((total + c - 1) div c - 1)) END AS BIGINT)"
            ).alias("code_bits"),
            F.expr(
                "CAST(CASE WHEN vocab <= 1 THEN 1 "
                "ELSE length(bin(vocab - 1)) END AS BIGINT)"
            ).alias("fixed_bits"),
        )
        .select(
            "tok",
            "c",
            "code_bits",
            (F.col("c") * F.col("code_bits")).cast("long").alias(
                "weighted_bits"
            ),
            "fixed_bits",
            (F.col("c") * F.col("fixed_bits")).cast("long").alias(
                "fixed_weighted_bits"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Positional phrase query over an inverted index
# ---------------------------------------------------------------------------

_PHRASES = [("table", "hash"), ("customer", "join"), ("merge", "group")]
_PHRASE_VALUES = ", ".join(f"('{a}', '{b}')" for a, b in _PHRASES)


@register(
    "index_phrase_query",
    f"""
    WITH tk AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), post AS (
      SELECT doc_id, toks[i] AS tok, i AS pos
      FROM tk, unnest(range(1, len(toks) + 1)) AS u(i)
    ), ph(w1, w2) AS (VALUES {_PHRASE_VALUES})
    SELECT ph.w1 || ' ' || ph.w2 AS phrase, p1.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM ph
    JOIN post p1 ON p1.tok = ph.w1
    JOIN post p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
                AND p2.tok = ph.w2
    GROUP BY 1, 2
    """,
    "Positional phrase query — the inverted-index capability term "
    "lookup alone cannot give you (Lucene/ES match_phrase): postings "
    "carry POSITIONS (posexplode), and a phrase hits where the second "
    "term's posting sits at exactly pos+1 of the first's, per "
    "document. Three fixed phrases are resolved in one pass: the "
    "phrase spine is a broadcast literal, the adjacency check is an "
    "equi-join on (doc, pos+1) — at 100 TB this is two posting-list "
    "retrievals + a positional merge per phrase, never a rescan of "
    "raw text. Companion to inverted_index (term level) and "
    "text_winnow_fingerprints (shingle level).",
)
def index_phrase_query(spark, sf_dir):
    post = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.posexplode(_toks_a()).alias("pos0", "tok"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    )
    ph = spark.createDataFrame(_PHRASES, "w1 string, w2 string")
    p1 = post.join(F.broadcast(ph), post["tok"] == ph["w1"]).select(
        "doc_id", "pos", "w1", "w2"
    )
    p2 = post.select(
        F.col("doc_id").alias("d2"),
        F.col("pos").alias("pos2"),
        F.col("tok").alias("tok2"),
    )
    return (
        p1.join(
            p2,
            (F.col("doc_id") == F.col("d2"))
            & (F.col("pos2") == F.col("pos") + 1)
            & (F.col("tok2") == F.col("w2")),
        )
        .groupBy(
            F.concat_ws(" ", "w1", "w2").alias("phrase"), "doc_id"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )


# ---------------------------------------------------------------------------
# PQ/ADC recall audit against the exact baseline
# ---------------------------------------------------------------------------


def _pq_recall_oracle(sf_dir: str | None = None) -> str:
    """Composes the two REGISTERED pipeline oracles (sim_pq_adc_topk and
    sim_bruteforce_topk) as subqueries — the audit replays both full
    candidate pipelines, not a simplification of either."""
    from youtube_trending_data_pipeline_spark.catalog import QUERIES

    pq = QUERIES["sim_pq_adc_topk"].oracle
    bf = QUERIES["sim_bruteforce_topk"].oracle
    return f"""
    WITH pq AS (SELECT query_id, neighbor_id FROM ({pq}) x),
         bf AS (SELECT query_id, neighbor_id FROM ({bf}) y),
         ov AS (
           SELECT pq.query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
           FROM pq JOIN bf USING (query_id, neighbor_id)
           GROUP BY 1
         )
    SELECT q.query_id,
           CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
           CAST(3 AS BIGINT) AS k,
           CAST((1000000 * COALESCE(ov.n_overlap, 0)) // 3 AS BIGINT)
             AS recall_ppm
    FROM (SELECT DISTINCT query_id FROM bf) q
    LEFT JOIN ov ON ov.query_id = q.query_id
    """


@register(
    "sim_pq_recall_audit",
    _pq_recall_oracle,
    "PQ/ADC recall audit — the number that decides whether a "
    "product-quantized index is deployable: per query, how many of "
    "the EXACT top-3 neighbors (sim_bruteforce_topk's pipeline) the "
    "asymmetric-distance PQ search (sim_pq_adc_topk's pipeline) "
    "actually returns, as recall@3 in integer ppm. Both sides are "
    "the REGISTERED pipelines composed whole — the Spark plan joins "
    "the two entry DataFrames, the oracle nests the two entry "
    "oracles as subqueries — so the audit can never drift from what "
    "the index entries themselves compute. The compression-vs-"
    "quality readout every ANN deployment pins to a dashboard.",
)
def sim_pq_recall_audit(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import QUERIES

    pq = QUERIES["sim_pq_adc_topk"].fn(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    bf = QUERIES["sim_bruteforce_topk"].fn(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    ov = pq.join(bf, ["query_id", "neighbor_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap")
    )
    q = bf.select("query_id").distinct()
    return q.join(ov, "query_id", "left").select(
        "query_id",
        F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
        F.lit(3).cast("long").alias("k"),
        F.expr(
            "CAST((1000000 * COALESCE(n_overlap, 0)) div 3 AS BIGINT)"
        ).alias("recall_ppm"),
    )


# ---------------------------------------------------------------------------
# MATCH_RECOGNIZE-style sequence pattern over event runs
# ---------------------------------------------------------------------------

_MR_PATTERN = ("click", "view", "purchase")


@register(
    "pattern_match_recognize",
    f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_ns(ts) AS tsn, event_id
      FROM events
    ), marked AS (
      SELECT user_id, event_type, tsn, event_id,
             CASE WHEN event_type = LAG(event_type) OVER w
                  THEN 0 ELSE 1 END AS is_start
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)
    ), runs AS (
      SELECT user_id, event_type, tsn, event_id,
             SUM(is_start) OVER (PARTITION BY user_id
                                 ORDER BY tsn, event_id
                                 ROWS UNBOUNDED PRECEDING) AS run_id
      FROM marked
    ), rle AS (
      SELECT user_id, run_id, MIN(event_type) AS event_type,
             CAST(COUNT(*) AS BIGINT) AS run_len
      FROM runs GROUP BY user_id, run_id
    ), seq AS (
      SELECT user_id, run_id, event_type, run_len,
             LEAD(event_type, 1) OVER w AS t2,
             LEAD(run_len, 1) OVER w AS l2,
             LEAD(event_type, 2) OVER w AS t3,
             LEAD(run_len, 2) OVER w AS l3
      FROM rle WINDOW w AS (PARTITION BY user_id ORDER BY run_id)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(SUM(run_len + l2 + l3) AS BIGINT) AS events_spanned
    FROM seq
    WHERE event_type = '{_MR_PATTERN[0]}'
      AND t2 = '{_MR_PATTERN[1]}'
      AND t3 = '{_MR_PATTERN[2]}'
    GROUP BY user_id
    """,
    "MATCH_RECOGNIZE emulation (SQL:2016 row-pattern matching, which "
    "Spark does not ship): the pattern click+ view+ purchase+ is "
    "found per user by run-length-encoding the event-type sequence "
    "(lag -> run starts -> prefix-sum run ids -> one aggregate per "
    "run) and sliding a 3-run window over the RLE — a regex over "
    "RUNS instead of rows, which is how Flink/Trino implement "
    "greedy quantifiers. Reports match counts and the events each "
    "match spans. Every step is a keyed window or aggregate; the "
    "RLE table is at most one row per run, so the pattern join "
    "never rescans raw events — the funnel_view_click_purchase "
    "sibling with true adjacency semantics (no intervening other "
    "events allowed).",
)
def pattern_match_recognize(spark, sf_dir):
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").alias("tsn"), "event_id"
    )
    wu = W.partitionBy("user_id").orderBy("tsn", "event_id")
    marked = e.withColumn(
        "is_start",
        F.when(
            F.col("event_type") == F.lag("event_type").over(wu), 0
        ).otherwise(1),
    )
    runs = marked.withColumn(
        "run_id",
        F.sum("is_start").over(wu.rowsBetween(W.unboundedPreceding, 0)),
    )
    rle = runs.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("event_type"),
        F.count(F.lit(1)).cast("long").alias("run_len"),
    )
    wr = W.partitionBy("user_id").orderBy("run_id")
    seq = rle.select(
        "user_id",
        "event_type",
        "run_len",
        F.lead("event_type", 1).over(wr).alias("t2"),
        F.lead("run_len", 1).over(wr).alias("l2"),
        F.lead("event_type", 2).over(wr).alias("t3"),
        F.lead("run_len", 2).over(wr).alias("l3"),
    )
    return (
        seq.where(
            (F.col("event_type") == _MR_PATTERN[0])
            & (F.col("t2") == _MR_PATTERN[1])
            & (F.col("t3") == _MR_PATTERN[2])
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matches"),
            F.sum(F.col("run_len") + F.col("l2") + F.col("l3"))
            .cast("long")
            .alias("events_spanned"),
        )
    )


# ---------------------------------------------------------------------------
# Grouped-aggregate pandas UDAF under the exact gate: weighted median
# ---------------------------------------------------------------------------


@register(
    "udaf_weighted_median",
    """
    WITH e AS (
      SELECT event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS v,
             1 + (event_id % 3) AS w
      FROM events
    ), cum AS (
      SELECT event_type, v, w,
             SUM(w) OVER (PARTITION BY event_type
                          ORDER BY v, w
                          ROWS UNBOUNDED PRECEDING) AS run,
             SUM(w) OVER (PARTITION BY event_type) AS total
      FROM e
    )
    SELECT event_type,
           CAST(MIN(CASE WHEN 2 * run >= total THEN v END) AS BIGINT)
             AS weighted_median_c,
           CAST(MAX(total) AS BIGINT) AS total_weight
    FROM cum GROUP BY event_type
    """,
    "Weighted median per event type via a GROUPED_AGG pandas UDAF — "
    "the §2.11 extension surface under the EXACT gate, not just a "
    "smoke test: Arrow ships each group's (value, weight) arrays to a "
    "vectorized numpy kernel (sort + cumsum + searchsorted — the "
    "lower weighted median, smallest v whose cumulative weight "
    "reaches half the total, ties resolved by the same (v, w) sort "
    "order the oracle uses). Weights are deterministic (1 + id % 3). "
    "The oracle replays the definition with windows. Where a "
    "cumulative-window SQL form also exists (and the oracle uses "
    "it), the UDAF form is the one that generalizes to kernels SQL "
    "cannot express — this entry pins the Arrow path's exactness so "
    "those kernels inherit a proven harness.",
)
def udaf_weighted_median(spark, sf_dir):
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    from youtube_trending_data_pipeline_spark.catalog import cents

    # functionType spelled explicitly: this module uses
    # `from __future__ import annotations`, which stringifies the type
    # hints pandas_udf would otherwise infer GROUPED_AGG from
    @pandas_udf("bigint", PandasUDFType.GROUPED_AGG)
    def wmedian(v, w):
        vv = v.to_numpy(dtype=np.int64)
        ww = w.to_numpy(dtype=np.int64)
        order = np.lexsort((ww, vv))  # (v, w) ascending — the oracle's order
        vv, ww = vv[order], ww[order]
        run = np.cumsum(ww)
        idx = int(np.searchsorted(2 * run, run[-1], side="left"))
        return int(vv[idx])

    # Spark disallows mixing a GROUPED_AGG pandas UDF with JVM
    # aggregates in one agg — the weight total is a pandas UDAF too
    @pandas_udf("bigint", PandasUDFType.GROUPED_AGG)
    def wsum(w):
        return int(w.to_numpy(dtype=np.int64).sum())

    e = t(spark, sf_dir, "events").select(
        "event_type",
        cents("value").alias("v"),
        (1 + F.col("event_id") % 3).cast("long").alias("w"),
    )
    return e.groupBy("event_type").agg(
        wmedian("v", "w").alias("weighted_median_c"),
        wsum("w").alias("total_weight"),
    )


# ---------------------------------------------------------------------------
# Greedy max-coverage subset selection (submodular)
# ---------------------------------------------------------------------------

_MC_PICKS = 5


def _maxcov_oracle() -> str:
    """Unrolled greedy rounds; MATERIALIZED covered sets (each round
    reads the previous covered set twice: gain anti-join + union)."""
    steps = []
    for r in range(1, _MC_PICKS + 1):
        steps.append(f"""
    p{r} AS MATERIALIZED (
      SELECT cov.doc_id, CAST(COUNT(*) AS BIGINT) AS n_new
      FROM cov
      WHERE NOT EXISTS (SELECT 1 FROM c{r - 1} x WHERE x.bg = cov.bg)
      GROUP BY cov.doc_id
      ORDER BY n_new DESC, cov.doc_id
      LIMIT 1
    ),
    c{r} AS MATERIALIZED (
      SELECT bg FROM c{r - 1}
      UNION
      SELECT cov.bg FROM cov JOIN p{r} USING (doc_id)
    )""")
    unions = "\n      UNION ALL\n".join(
        f"      SELECT CAST({r} AS BIGINT) AS pick_round, doc_id, n_new "
        f"FROM p{r}"
        for r in range(1, _MC_PICKS + 1)
    )
    return f"""
    WITH tk AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), cov AS MATERIALIZED (
      SELECT DISTINCT doc_id, b.bg FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i + 1])) AS bg
        FROM tk WHERE len(toks) >= 2
      ) b(doc_id, bg)
    ), c0 AS MATERIALIZED (SELECT CAST(NULL AS VARCHAR) AS bg WHERE false),
    {','.join(steps)},
    picks AS (
{unions}
    )
    SELECT pick_round, doc_id, n_new,
           CAST(SUM(n_new) OVER (ORDER BY pick_round
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS total_covered
    FROM picks
    """


@register(
    "select_greedy_max_coverage",
    _maxcov_oracle(),
    "Greedy max-coverage subset selection (the 1-1/e submodular "
    "baseline; Nemhauser et al. 1978) — the data-selection shape "
    "behind diverse-subset curation (facility location, coreset "
    "picks): each of 5 rounds picks the document covering the most "
    "NOT-YET-COVERED bigrams (ties to the smaller doc_id) and adds "
    "its bigrams to the covered set. Per round: one anti-join of the "
    "coverage table against the covered set + one gain aggregate + a "
    "1-row argmax — the covered set is the only state, and it only "
    "grows, so the unrolled-CTE oracle replays the exact prefix "
    "(pagerank doctrine). Reports marginal and cumulative coverage "
    "per pick — the diminishing-returns curve a curation team reads "
    "to choose the subset size.",
)
def select_greedy_max_coverage(spark, sf_dir):
    cov = (
        t(spark, sf_dir, "documents")
        .select("doc_id", _toks_a().alias("toks"))
        .where(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> concat(toks[i - 1], ' ', toks[i]))"
                )
            ).alias("bg"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    covered = None
    picks = None
    for r in range(1, _MC_PICKS + 1):
        remaining = (
            cov
            if covered is None
            else cov.join(covered, "bg", "left_anti")
        )
        gains = remaining.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_new")
        )
        pick = (
            gains.orderBy(F.desc("n_new"), F.asc("doc_id"))
            .limit(1)
            .select(
                F.lit(r).cast("long").alias("pick_round"),
                "doc_id",
                "n_new",
            )
            .localCheckpoint(eager=False)
        )
        picks = pick if picks is None else picks.unionAll(pick)
        newly = cov.join(
            pick.select("doc_id"), "doc_id", "left_semi"
        ).select("bg")
        covered = (
            newly
            if covered is None
            else covered.union(newly).distinct()
        ).localCheckpoint(eager=False)
    wc = W.orderBy("pick_round").rowsBetween(W.unboundedPreceding, 0)
    return picks.select(
        "pick_round",
        "doc_id",
        "n_new",
        F.sum("n_new").over(wc).cast("long").alias("total_covered"),
    )


# ---------------------------------------------------------------------------
# Backfill gap planner
# ---------------------------------------------------------------------------

_BF_USER_MOD = 31  # the monitored slice (sparse enough to have real gaps)


@register(
    "backfill_gap_plan",
    f"""
    WITH d AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day
      FROM events WHERE user_id % {_BF_USER_MOD} = 0
      GROUP BY 1, 2
    ), nxt AS (
      SELECT event_type, day,
             LEAD(day) OVER (PARTITION BY event_type ORDER BY day)
               AS next_day
      FROM d
    )
    SELECT event_type,
           CAST(day + 1 AS BIGINT) AS gap_start_day,
           CAST(next_day - 1 AS BIGINT) AS gap_end_day,
           CAST(next_day - day - 1 AS BIGINT) AS n_missing_days
    FROM nxt
    WHERE next_day > day + 1
    """,
    "Backfill gap planner — the ops query every partitioned ingest "
    "needs after an outage: per event type (on a monitored user "
    "slice), the distinct ingested days are scanned with one LEAD "
    "window, and every hole in the calendar becomes an explicit "
    "(gap_start, gap_end, n_days) BACKFILL RANGE — the exact "
    "arguments a replay job takes, not just a count of missing days. "
    "The inverse of activity_islands (ranges of ABSENCE, not "
    "presence), emitted as ranges so a 3-year outage is one row, not "
    "a thousand. One distinct-day aggregate (partition-pruned on a "
    "real lake) + one keyed window.",
)
def backfill_gap_plan(spark, sf_dir):
    d = (
        t(spark, sf_dir, "events")
        .where(F.col("user_id") % _BF_USER_MOD == 0)
        .select(
            "event_type",
            F.expr("(ts div 1000) div 86400000000").alias("day"),
        )
        .distinct()
    )
    wn = W.partitionBy("event_type").orderBy("day")
    nxt = d.withColumn("next_day", F.lead("day").over(wn))
    return nxt.where(F.col("next_day") > F.col("day") + 1).select(
        "event_type",
        (F.col("day") + 1).cast("long").alias("gap_start_day"),
        (F.col("next_day") - 1).cast("long").alias("gap_end_day"),
        (F.col("next_day") - F.col("day") - 1)
        .cast("long")
        .alias("n_missing_days"),
    )


# ---------------------------------------------------------------------------
# Join-cardinality estimation from a key sample
# ---------------------------------------------------------------------------

_JC_SAMPLE_MOD = 16


@register(
    "join_cardinality_estimate",
    f"""
    WITH fa AS (
      SELECT l_suppkey AS k, CAST(COUNT(*) AS BIGINT) AS f
      FROM lineitem GROUP BY 1
    ), fb AS (
      SELECT s_suppkey AS k, CAST(COUNT(*) AS BIGINT) AS f
      FROM supplier GROUP BY 1
    ), joined AS (
      SELECT fa.k, fa.f AS f_a, fb.f AS f_b,
             {_H32_DUCK.format(s="CAST(fa.k AS VARCHAR)")} AS h
      FROM fa JOIN fb USING (k)
    )
    SELECT CAST(SUM(f_a * f_b) AS BIGINT) AS exact_rows,
           CAST({_JC_SAMPLE_MOD} * SUM(CASE WHEN h % {_JC_SAMPLE_MOD} = 0
                    THEN f_a * f_b ELSE 0 END) AS BIGINT) AS est_rows,
           CAST(SUM(CASE WHEN h % {_JC_SAMPLE_MOD} = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS sampled_keys,
           CAST(COUNT(*) AS BIGINT) AS join_keys
    FROM joined
    """,
    "Join-cardinality estimation from a deterministic key sample — "
    "what a cost-based optimizer does with sampled statistics before "
    "choosing a join strategy, made auditable: the exact equi-join "
    "output size is sum(f_a * f_b) over matching keys, the estimate "
    "scales the same sum over a hash-chosen 1/16 key subset (the "
    "HASH sample, not a row sample — per-key frequency pairs must "
    "stay intact or the product is biased), and both land in one "
    "result row for side-by-side error reading. At 100 TB the "
    "frequency tables come from statistics collection, never the "
    "fact scan; the estimate costs 1/16 of the stats join.",
)
def join_cardinality_estimate(spark, sf_dir):
    fa = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_suppkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("f_a"))
    )
    fb = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_suppkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("f_b"))
    )
    joined = fa.join(fb, "k").select(
        "k",
        "f_a",
        "f_b",
        F.expr(_H32_SPARK.format(s="cast(k as string)")).alias("h"),
    )
    return joined.agg(
        F.sum(F.col("f_a") * F.col("f_b")).cast("long").alias("exact_rows"),
        (
            _JC_SAMPLE_MOD
            * F.sum(
                F.when(
                    F.col("h") % _JC_SAMPLE_MOD == 0,
                    F.col("f_a") * F.col("f_b"),
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("est_rows"),
        F.sum(F.when(F.col("h") % _JC_SAMPLE_MOD == 0, 1).otherwise(0))
        .cast("long")
        .alias("sampled_keys"),
        F.count(F.lit(1)).cast("long").alias("join_keys"),
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast error audit
# ---------------------------------------------------------------------------

_SN_LAG_DAYS = 7


@register(
    "forecast_seasonal_naive_mae",
    f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT event_type, day, v,
             LAG(v, {_SN_LAG_DAYS}) OVER (PARTITION BY event_type
                                          ORDER BY day) AS pred
      FROM daily
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_scored_days,
           CAST(SUM(abs(v - pred)) AS BIGINT) AS total_abs_err_c,
           CAST(SUM(abs(v - pred)) // COUNT(*) AS BIGINT) AS mae_c,
           CAST((1000000 * SUM(abs(v - pred))) // SUM(abs(v)) AS BIGINT)
             AS wape_ppm
    FROM lagged WHERE pred IS NOT NULL
    GROUP BY event_type
    """,
    "Seasonal-naive forecast error audit — the baseline every demand "
    "model must beat before it ships (M-competition doctrine): "
    "predict each day's per-type cent volume by the SAME WEEKDAY "
    "LAST WEEK (lag 7 on the daily series), score MAE in cents and "
    "WAPE in ppm. Days with no 7-day-old counterpart are excluded, "
    "not zero-filled (an honest scorecard doesn't invent a prior "
    "week). NOTE: lag-7 on ROW position equals lag-7 on the calendar "
    "only while the daily series is gap-free — true for the full "
    "event stream here; a gappy series would first pass through "
    "backfill_gap_plan's calendar spine. One daily aggregate + one "
    "keyed window; the forecast-evaluation sibling of "
    "holt_linear_fold's model side.",
)
def forecast_seasonal_naive_mae(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import cents

    daily = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("(ts div 1000) div 86400000000").alias("day"),
            cents("value").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").cast("long").alias("v"))
    )
    wl = W.partitionBy("event_type").orderBy("day")
    lagged = daily.withColumn("pred", F.lag("v", _SN_LAG_DAYS).over(wl))
    return (
        lagged.where(F.col("pred").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_scored_days"),
            F.sum(F.abs(F.col("v") - F.col("pred")))
            .cast("long")
            .alias("total_abs_err_c"),
            F.expr(
                "CAST(SUM(abs(v - pred)) div COUNT(*) AS BIGINT)"
            ).alias("mae_c"),
            F.expr(
                "CAST((1000000 * SUM(abs(v - pred))) div SUM(abs(v)) "
                "AS BIGINT)"
            ).alias("wape_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------

_RFM_Q = 5


@register(
    "rfm_segmentation",
    f"""
    WITH per_user AS (
      SELECT user_id,
             MAX(epoch_us(ts)) AS last_us,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS monetary_c
      FROM events GROUP BY user_id
    ), anchor AS (SELECT MAX(last_us) AS now_us FROM per_user),
    rfm AS (
      SELECT u.user_id,
             CAST((a.now_us - u.last_us) // 86400000000 AS BIGINT)
               AS recency_days,
             u.frequency, u.monetary_c,
             NTILE({_RFM_Q}) OVER (ORDER BY a.now_us - u.last_us,
                                   u.user_id) AS r_score,
             NTILE({_RFM_Q}) OVER (ORDER BY u.frequency DESC, u.user_id)
               AS f_score,
             NTILE({_RFM_Q}) OVER (ORDER BY u.monetary_c DESC, u.user_id)
               AS m_score
      FROM per_user u, anchor a
    )
    SELECT user_id, recency_days, frequency, monetary_c,
           CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(100 * r_score + 10 * f_score + m_score AS BIGINT)
             AS rfm_segment
    FROM rfm
    """,
    "RFM segmentation (Hughes 1994, the recency/frequency/monetary "
    "quintile scoring CRM pipelines still run): per user, days since "
    "last event (anchored to the CORPUS max — no wall clock, so the "
    "result is a pure function of the data), event count, and cent "
    "volume, each cut into quintiles by NTILE with deterministic "
    "user_id tie-breaks (score 1 = best: most recent / most frequent "
    "/ highest spend), concatenated into the classic 3-digit segment "
    "code. One user aggregate + three dimension-table windows; the "
    "1-row anchor is a broadcast constant-append. The analytics "
    "sibling of retention_cohorts.",
)
def rfm_segmentation(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import cents

    per_user = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(F.expr("ts div 1000")).alias("last_us"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(cents("value")).cast("long").alias("monetary_c"),
        )
    )
    anchor = per_user.agg(F.max("last_us").alias("now_us"))
    base = per_user.crossJoin(F.broadcast(anchor))
    wr = W.orderBy(F.expr("now_us - last_us"), F.asc("user_id"))
    wf = W.orderBy(F.desc("frequency"), F.asc("user_id"))
    wm = W.orderBy(F.desc("monetary_c"), F.asc("user_id"))
    rfm = base.select(
        "user_id",
        F.expr("(now_us - last_us) div 86400000000").alias("recency_days"),
        "frequency",
        "monetary_c",
        F.ntile(_RFM_Q).over(wr).cast("long").alias("r_score"),
        F.ntile(_RFM_Q).over(wf).cast("long").alias("f_score"),
        F.ntile(_RFM_Q).over(wm).cast("long").alias("m_score"),
    )
    return rfm.withColumn(
        "rfm_segment",
        (
            100 * F.col("r_score") + 10 * F.col("f_score") + F.col("m_score")
        ).cast("long"),
    )


# ---------------------------------------------------------------------------
# Overdispersion (variance-to-mean) audit of daily counts
# ---------------------------------------------------------------------------


@register(
    "dq_overdispersion_vmr",
    """
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s1,
             CAST(SUM(x * x) AS BIGINT) AS s2
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n, s1 AS total_events,
           CAST((n * s2 - s1 * s1) AS BIGINT) AS var_num_scaled,
           CAST((1000000 * (n * s2 - s1 * s1)) // ((n - 1) * s1) AS BIGINT)
             AS vmr_ppm
    FROM m WHERE n > 1
    """,
    "Overdispersion audit — the Poisson-assumption check run before "
    "anyone fits a count model or sets a rate alert: per event type, "
    "the variance-to-mean ratio of DAILY counts as exact integers "
    "(VMR = (n*S2 - S1^2) / ((n-1)*S1), every term a BIGINT moment "
    "sum, no float variance), in ppm: ~1e6 means Poisson-like, far "
    "above means bursty/clumped days (alerts need wider bands), far "
    "below means suspiciously uniform (synthetic or throttled data — "
    "which is exactly what this corpus' generator produces, and the "
    "behavioral test pins). One daily aggregate + one moment "
    "aggregate; the count-model sibling of dq_benford_digits.",
)
def dq_overdispersion_vmr(spark, sf_dir):
    daily = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("(ts div 1000) div 86400000000").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
    )
    return m.where(F.col("n") > 1).select(
        "event_type",
        "n",
        F.col("s1").alias("total_events"),
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
        .cast("long")
        .alias("var_num_scaled"),
        F.expr(
            "CAST((1000000 * (n * s2 - s1 * s1)) div ((n - 1) * s1) "
            "AS BIGINT)"
        ).alias("vmr_ppm"),
    )


# ---------------------------------------------------------------------------
# A-priori level-wise 3-itemset mining
# ---------------------------------------------------------------------------

# Round 7: min-support is CORPUS-RELATIVE (ppm of the document count),
# not absolute — with absolute thresholds a 10x corpus makes 10x more
# pairs "frequent" in relative terms and the candidate self-join
# explodes (measured 26x at 10x data in the r7 scale sweep; 1.4x after
# this change). 60000/54000 ppm reproduce the old 300/270 absolute
# thresholds exactly at sf0.1 (5000 docs).
_AP_PAIR_PPM = 60_000     # pair min-support: 6% of corpus
_AP_TRIPLE_PPM = 54_000   # triple min-support: 5.4% of corpus


@register(
    "apriori_triple_itemsets",
    f"""
    WITH nd AS (
      SELECT (CAST({_AP_PAIR_PPM} AS BIGINT) * COUNT(*)) // 1000000
               AS pair_min,
             (CAST({_AP_TRIPLE_PPM} AS BIGINT) * COUNT(*)) // 1000000
               AS triple_min
      FROM documents
    ), dt AS (
      SELECT doc_id, list_distinct({_TOKS_SQL}) AS v FROM documents
    ), item AS (
      SELECT doc_id, unnest(v) AS tok FROM dt
    ), pairs AS (
      SELECT a.doc_id, a.tok AS w1, b.tok AS w2
      FROM item a JOIN item b
        ON a.doc_id = b.doc_id AND a.tok < b.tok
    ), fp AS (
      SELECT w1, w2 FROM pairs GROUP BY 1, 2
      HAVING COUNT(*) >= (SELECT pair_min FROM nd)
    ), cand AS (
      SELECT p1.w1 AS a, p1.w2 AS b, p2.w2 AS c3
      FROM fp p1 JOIN fp p2 ON p1.w1 = p2.w1 AND p1.w2 < p2.w2
    ), pruned AS (
      SELECT cand.a, cand.b, cand.c3
      FROM cand JOIN fp ON fp.w1 = cand.b AND fp.w2 = cand.c3
    ), tri AS (
      SELECT i1.doc_id, p.a, p.b, p.c3
      FROM pruned p
      JOIN item i1 ON i1.tok = p.a
      JOIN item i2 ON i2.doc_id = i1.doc_id AND i2.tok = p.b
      JOIN item i3 ON i3.doc_id = i1.doc_id AND i3.tok = p.c3
    )
    SELECT a AS w1, b AS w2, c3 AS w3,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM tri GROUP BY 1, 2, 3
    HAVING COUNT(*) >= (SELECT triple_min FROM nd)
    """,
    "A-priori level-wise 3-itemset mining (Agrawal & Srikant 1994): "
    "frequent pairs (min-support 6% of the corpus — RELATIVE, the "
    "r7 scale fix: absolute thresholds made the candidate join "
    "super-linear, 26x at 10x data; relative ones hold it at ~1x) "
    "SELF-JOIN on a shared prefix to generate candidate triples, "
    "the downward-closure prune drops any candidate whose third "
    "face-pair is infrequent (the step that makes A-priori feasible "
    "— candidates fall from C(V,3) to only those with all three "
    "frequent faces), and survivors are counted against the corpus "
    "at 5.4% min-support. "
    "Round 8: support counting is per-doc COMBINATION GENERATION, "
    "not an item-table join. Each doc's token list is intersected "
    "with the frequent-token array (level 1) / candidate-token "
    "array (level 3) — both dimension-sized 1-row broadcasts, "
    "bounded by the 6% floor — and sorted C(f,2) / C(f,3) combos "
    "are emitted map-side by nested transform/slice (JVM codegen, "
    "zero joins on the exploded item table). The r7 shape joined "
    "pruned candidates back to item THREE times; with a dense "
    "vocabulary every candidate token matched ~every doc (~166M "
    "intermediate rows at sf1) and the stage measured 10.1 s -> "
    "165 s at 10x data. The combo explode is linear in docs "
    "(measured in-round: see PERF.md). "
    "This is the LEVEL-WISE shape token_cooccurrence_pairs "
    "(level 2) feeds: candidate generation and pruning touch only "
    "the dimension-sized frequent-pair table; triple supports are "
    "a broadcast semi-join + one partial-aggregated groupBy. "
    "Basket analysis' step beyond pairwise lift "
    "(basket_brand_lift).",
)
def apriori_triple_itemsets(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    # corpus-relative min-supports as a 1-row broadcast (constant-append)
    nd = docs.agg(
        F.expr(
            f"CAST(({_AP_PAIR_PPM} * COUNT(*)) div 1000000 AS BIGINT)"
        ).alias("pair_min"),
        F.expr(
            f"CAST(({_AP_TRIPLE_PPM} * COUNT(*)) div 1000000 AS BIGINT)"
        ).alias("triple_min"),
    )
    toks = F.array_distinct(_toks_a())
    # Level 1: doc-frequency per token -> frequent singletons as ONE
    # sorted array row (downward closure: a frequent pair's members are
    # frequent, so pre-filtering docs to F1 tokens leaves fp unchanged).
    f1row = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(nd))
        .where(F.col("c") >= F.col("pair_min"))
        .agg(F.sort_array(F.collect_list("tok")).alias("f1arr"))
    )
    # Level 2: per-doc sorted F1-token array -> map-side C(f,2) combos.
    # The combo explode is the hot stage; the parquet scan may plan few
    # input splits, so round-robin repartition the SLIM per-doc array
    # projection (ints/short strings, never text) to spread generation
    # across all cores — at 100 TB this shuffles only dimension-bounded
    # arrays, one row per doc.
    par = spark.sparkContext.defaultParallelism
    pair_combos = (
        docs.crossJoin(F.broadcast(f1row))
        .select(F.sort_array(F.array_intersect(toks, "f1arr")).alias("v"))
        .repartition(par)
        .select(
            F.explode(
                F.expr(
                    """flatten(transform(v, (x1, i) ->
                         transform(slice(v, i + 2, size(v)), x2 ->
                           named_struct('w1', x1, 'w2', x2))))"""
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    fp = (
        pair_combos.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(nd))
        .where(F.col("c") >= F.col("pair_min"))
        .select("w1", "w2")
        .localCheckpoint(eager=False)
    )
    p1, p2 = fp.alias("p1"), fp.alias("p2")
    cand = p1.join(
        p2,
        (F.col("p1.w1") == F.col("p2.w1"))
        & (F.col("p1.w2") < F.col("p2.w2")),
    ).select(
        F.col("p1.w1").alias("a"),
        F.col("p1.w2").alias("b"),
        F.col("p2.w2").alias("c3"),
    )
    face = fp.select(F.col("w1").alias("fb"), F.col("w2").alias("fc"))
    pruned = cand.join(
        face,
        (F.col("b") == F.col("fb")) & (F.col("c3") == F.col("fc")),
        "left_semi",
    ).localCheckpoint(eager=False)
    # Level 3: candidate-token array (1 row); per-doc combos are packed
    # LONG keys (token -> index in the sorted candidate array, triple ->
    # (i*V + j)*V + k) so the 100M+-row combo stream is generated,
    # probed, and aggregated as single longs, never 3-string structs
    # (measured 2.4x on the whole entry at sf1). Broadcast semi-join to
    # pruned-candidate keys BEFORE the aggregate so the hash table and
    # shuffle carry only candidate triples.
    candrow = pruned.agg(
        F.sort_array(
            F.array_distinct(
                F.flatten(F.collect_list(F.array("a", "b", "c3")))
            )
        ).alias("candarr")
    )
    tri_keys = (
        docs.crossJoin(F.broadcast(candrow))
        .select(
            F.expr(
                # sorted candidate-token indices present in the doc
                # (candarr order IS sorted token order)
                """filter(
                     transform(candarr, (x, i) ->
                       IF(array_contains({toks}, x), i, -1)),
                     y -> y >= 0)""".format(toks="array_distinct(" + _TOKS_A_SQL + ")")
            ).alias("vi"),
            F.size("candarr").cast("long").alias("nv"),
        )
        .repartition(par)
        .select(
            F.explode(
                F.expr(
                    """flatten(flatten(transform(vi, (a1, i) ->
                         transform(slice(vi, i + 2, size(vi)), (a2, j) ->
                           transform(slice(vi, i + j + 3, size(vi)), a3 ->
                             (CAST(a1 AS BIGINT) * nv + a2) * nv + a3)))))"""
                )
            ).alias("k")
        )
    )
    pruned_keys = pruned.crossJoin(F.broadcast(candrow)).select(
        F.col("a").alias("w1"),
        F.col("b").alias("w2"),
        F.col("c3").alias("w3"),
        F.expr(
            """(CAST(array_position(candarr, a) - 1 AS BIGINT)
                  * size(candarr) + (array_position(candarr, b) - 1))
                  * size(candarr) + (array_position(candarr, c3) - 1)"""
        ).alias("k"),
    )
    return (
        tri_keys.join(
            F.broadcast(pruned_keys.select("k")), ["k"], "left_semi"
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .join(F.broadcast(pruned_keys), ["k"])
        .crossJoin(F.broadcast(nd))
        .where(F.col("support") >= F.col("triple_min"))
        .select("w1", "w2", "w3", "support")
    )


# ---------------------------------------------------------------------------
# DBSCAN point classification on the spatial grid
# ---------------------------------------------------------------------------

_DB_MIN_PTS = 3  # neighbors (excluding self) required for a core point


@register(
    "geo_dbscan_core_points",
    f"""
    WITH pts AS (
      SELECT user_id,
             {_H32_DUCK.format(s="'x:' || CAST(user_id AS VARCHAR)")}
               % {_GEO_SPAN} AS x,
             {_H32_DUCK.format(s="'y:' || CAST(user_id AS VARCHAR)")}
               % {_GEO_SPAN} AS y
      FROM (SELECT DISTINCT user_id FROM events)
    ), nb AS (
      SELECT a.user_id, CAST(COUNT(*) AS BIGINT) AS n_neighbors
      FROM pts a JOIN pts b
        ON a.user_id <> b.user_id
       AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
           <= {_GEO_R2}
      GROUP BY a.user_id
    ), lab AS (
      SELECT p.user_id, COALESCE(nb.n_neighbors, 0) AS n_neighbors,
             CASE WHEN COALESCE(nb.n_neighbors, 0) >= {_DB_MIN_PTS}
                  THEN 'core' ELSE NULL END AS is_core
      FROM pts p LEFT JOIN nb ON nb.user_id = p.user_id
    ), border AS (
      SELECT DISTINCT a.user_id
      FROM pts a
      JOIN lab c ON c.is_core = 'core' AND c.user_id <> a.user_id
      JOIN pts cp ON cp.user_id = c.user_id
      WHERE (a.x - cp.x) * (a.x - cp.x) + (a.y - cp.y) * (a.y - cp.y)
            <= {_GEO_R2}
    )
    SELECT l.user_id, l.n_neighbors,
           CASE WHEN l.is_core = 'core' THEN 'core'
                WHEN b.user_id IS NOT NULL THEN 'border'
                ELSE 'noise' END AS label
    FROM lab l LEFT JOIN border b ON b.user_id = l.user_id
    """,
    "DBSCAN point classification (Ester et al. 1996, step 1 of "
    "density clustering) over the same hash-derived plane as "
    "geo_grid_spatial_join: a point is CORE with >= 3 in-radius "
    "neighbors, BORDER if in some core point's radius without being "
    "core itself, NOISE otherwise — the density labels that feed the "
    "cluster-expansion step (which is connected components over core "
    "points: operators/components.py, already in the engine). The "
    "Spark side reuses the grid 3x3 neighborhood probe for BOTH the "
    "neighbor count and the border test, so nothing is all-pairs; "
    "the oracle replays the quadratic definition. Together the three "
    "entries are a full distributed DBSCAN: grid join -> labels -> "
    "CC expansion.",
)
def geo_dbscan_core_points(spark, sf_dir):
    users = t(spark, sf_dir, "events").select("user_id").distinct()
    pts = users.select(
        "user_id",
        (
            F.expr(
                _H32_SPARK.format(s="concat('x:', cast(user_id as string))")
            )
            % _GEO_SPAN
        ).alias("x"),
        (
            F.expr(
                _H32_SPARK.format(s="concat('y:', cast(user_id as string))")
            )
            % _GEO_SPAN
        ).alias("y"),
    ).localCheckpoint(eager=False)
    home = pts.select(
        F.col("user_id").alias("ub"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.expr(f"x div {_GEO_CELL}").alias("cx"),
        F.expr(f"y div {_GEO_CELL}").alias("cy"),
    )
    probes = pts.select(
        F.col("user_id").alias("ua"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(-1, 1), i ->
                      transform(sequence(-1, 1), j ->
                        struct(x div {_GEO_CELL} + i AS cx,
                               y div {_GEO_CELL} + j AS cy))))"""
            )
        ).alias("c"),
    ).select(
        "ua", "xa", "ya", F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy")
    )
    in_radius = (
        probes.join(home, ["cx", "cy"])
        .where(F.col("ua") != F.col("ub"))
        .where(
            (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
            + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
            <= _GEO_R2
        )
        .select("ua", "ub")
        .localCheckpoint(eager=False)
    )
    nb = in_radius.groupBy("ua").agg(
        F.count(F.lit(1)).cast("long").alias("n_neighbors")
    )
    lab = pts.select("user_id").join(
        nb, pts["user_id"] == nb["ua"], "left"
    ).select(
        "user_id",
        F.coalesce("n_neighbors", F.lit(0)).cast("long").alias("n_neighbors"),
    )
    cores = lab.where(F.col("n_neighbors") >= _DB_MIN_PTS).select(
        F.col("user_id").alias("core_id")
    )
    # border = any point in a core's radius (pairs already computed)
    border = (
        in_radius.join(
            cores, in_radius["ub"] == cores["core_id"], "left_semi"
        )
        .select(F.col("ua").alias("b_id"))
        .distinct()
    )
    return lab.join(
        border, lab["user_id"] == border["b_id"], "left"
    ).select(
        "user_id",
        "n_neighbors",
        F.when(F.col("n_neighbors") >= _DB_MIN_PTS, "core")
        .when(F.col("b_id").isNotNull(), "border")
        .otherwise("noise")
        .alias("label"),
    )


# ---------------------------------------------------------------------------
# Multimodal: integer Sobel edge energy over synthetic 4x4 PPM assets
# ---------------------------------------------------------------------------

_SOBEL_W = 4


def _sobel_oracle() -> str:
    """Replays the 4x4 decode + every Sobel tap in pure SQL: the pixel
    bytes are the same (doc_id*7 + i*13) % 256 formula the Spark side
    encodes into the P6 payload."""
    W = _SOBEL_W

    def byte(i: int) -> str:
        return f"((doc_id * 7 + {i} * 13) % 256)"

    def gray(p: int) -> str:
        return (
            f"(({byte(3 * p)} + {byte(3 * p + 1)} + {byte(3 * p + 2)})"
            " // 3)"
        )

    def g(x: int, y: int) -> str:
        return f"g{y * W + x}"

    gdefs = ", ".join(f"{gray(p)} AS g{p}" for p in range(W * W))
    taps = []
    for y in range(1, W - 1):
        for x in range(1, W - 1):
            gx = (
                f"(-{g(x-1,y-1)} + {g(x+1,y-1)} - 2*{g(x-1,y)}"
                f" + 2*{g(x+1,y)} - {g(x-1,y+1)} + {g(x+1,y+1)})"
            )
            gy = (
                f"(-{g(x-1,y-1)} - 2*{g(x,y-1)} - {g(x+1,y-1)}"
                f" + {g(x-1,y+1)} + 2*{g(x,y+1)} + {g(x+1,y+1)})"
            )
            taps.append(f"(abs({gx}) + abs({gy}))")
    energy = " + ".join(taps)
    maxg = f"GREATEST({', '.join(taps)})"
    return f"""
    WITH px AS (
      SELECT CAST(doc_id AS VARCHAR) AS asset_id, {gdefs}
      FROM documents
    )
    SELECT asset_id,
           CAST({(W - 2) * (W - 2)} AS BIGINT) AS n_interior,
           CAST({energy} AS BIGINT) AS edge_energy,
           CAST({maxg} AS BIGINT) AS max_grad
    FROM px
    """


@register(
    "multimodal_image_sobel",
    _sobel_oracle(),
    "Multimodal integer Sobel edge energy: synthetic 4x4 P6 assets "
    "(deterministic byte formula), decoded by the REAL pure-Python "
    "PPM parser, convolved with the 3x3 Sobel Gx/Gy kernels over the "
    "valid interior — energy = sum(|gx|+|gy|), plus the max "
    "single-pixel gradient. The blur/structure screen run before the "
    "embedding pass (near-zero energy = flat or defocused asset). "
    "All-integer taps, so the oracle replays the ENTIRE convolution "
    "pixel-for-pixel; Arrow mapInPandas with the module's shared "
    "corrupt-asset quarantine policy. Scale shape: one pass over the "
    "binary column, per-asset O(pixels) work, no shuffle.",
)
def multimodal_image_sobel(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.operators.multimodal import (
        image_sobel_energy,
    )

    W = _SOBEL_W
    pixel_hex = F.concat(
        *[
            F.lpad(F.hex((F.col("doc_id") * 7 + i * 13) % 256), 2, "0")
            for i in range(3 * W * W)
        ]
    )
    media = t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.concat(
            F.encode(F.lit(f"P6\n{W} {W}\n255\n"), "utf-8"),
            F.unhex(pixel_hex),
        ).alias("content"),
    )
    return image_sobel_energy(media)


# ---------------------------------------------------------------------------
# Multimodal: audio zero-crossing rate
# ---------------------------------------------------------------------------


def _zcr_oracle() -> str:
    """Replays the 4 synthetic PCM16 samples and the sign-flip count."""

    def s(i: int) -> str:
        return f"((doc_id * 13 + {i} * 37) % 2048 - 1024)"

    def sgn(expr: str) -> str:
        return f"(CASE WHEN {expr} >= 0 THEN 1 ELSE -1 END)"

    flips = " + ".join(
        f"(CASE WHEN {sgn(s(i))} <> {sgn(s(i + 1))} THEN 1 ELSE 0 END)"
        for i in range(3)
    )
    energy = " + ".join(f"abs({s(i)})" for i in range(4))
    return f"""
    SELECT CAST(doc_id AS VARCHAR) AS asset_id,
           CAST(4 AS BIGINT) AS n_samples,
           CAST({flips} AS BIGINT) AS zero_crossings,
           CAST({energy} AS BIGINT) AS abs_energy
    FROM documents
    """


@register(
    "multimodal_audio_zcr",
    _zcr_oracle(),
    "Multimodal audio zero-crossing rate + integer absolute energy: "
    "the same synthetic PCM16 WAV assets as the silence trim, decoded "
    "by the REAL chunk-walking WAV parser, reduced to the sign-flip "
    "count (sign(0) counted non-negative — the convention is stated "
    "and replayed) and sum(|s|) — the voiced/unvoiced + silence "
    "screen of speech preprocessing, in exact integers. One Arrow "
    "pass over the binary column, shared quarantine policy, no "
    "shuffle.",
)
def multimodal_audio_zcr(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog_ext import (
        _wav_header_hex,
    )
    from youtube_trending_data_pipeline_spark.operators.multimodal import (
        audio_zero_crossings,
    )

    def sample_hex(i: int):
        v = (F.col("doc_id") * 13 + i * 37) % 2048 - 1024
        u = F.pmod(v, F.lit(65536))
        return F.concat(
            F.lpad(F.hex(u % 256), 2, "0"),
            F.lpad(F.hex(F.floor(u / 256).cast("long")), 2, "0"),
        )

    data_hex = F.concat(*[sample_hex(i) for i in range(4)])
    media = t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.lit("audio").alias("media_type"),
        F.concat(
            F.unhex(F.lit(_wav_header_hex())), F.unhex(data_hex)
        ).alias("content"),
    )
    return audio_zero_crossings(media)


# ---------------------------------------------------------------------------
# Sequence-completeness audit (dup / missing surrogate keys)
# ---------------------------------------------------------------------------


@register(
    "dq_sequence_audit",
    """
    WITH b AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids,
             CAST(MIN(event_id) AS BIGINT) AS min_id,
             CAST(MAX(event_id) AS BIGINT) AS max_id
      FROM events
    )
    SELECT n_rows, n_ids, min_id, max_id,
           CAST(n_rows - n_ids AS BIGINT) AS n_duplicate_rows,
           CAST((max_id - min_id + 1) - n_ids AS BIGINT) AS n_missing_ids,
           CAST(CASE WHEN n_rows = n_ids
                      AND n_ids = max_id - min_id + 1
                THEN 1 ELSE 0 END AS BIGINT) AS is_gap_free
    FROM b
    """,
    "Sequence-completeness audit over the event surrogate key — the "
    "first DQ check any CDC/ingest reconciliation runs: duplicate "
    "rows (rows minus distinct ids) and missing ids (span minus "
    "distinct) from ONE aggregate, no join against a generated "
    "spine — at 100 TB you cannot materialize a sequence table to "
    "anti-join, but min/max/count/distinct are one scan. A gap-free "
    "flag summarizes; the per-range remediation list is "
    "backfill_gap_plan's job once this flag trips.",
)
def dq_sequence_audit(spark, sf_dir):
    b = t(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("event_id").cast("long").alias("n_ids"),
        F.min("event_id").cast("long").alias("min_id"),
        F.max("event_id").cast("long").alias("max_id"),
    )
    return b.select(
        "n_rows",
        "n_ids",
        "min_id",
        "max_id",
        (F.col("n_rows") - F.col("n_ids")).cast("long").alias(
            "n_duplicate_rows"
        ),
        (F.col("max_id") - F.col("min_id") + 1 - F.col("n_ids"))
        .cast("long")
        .alias("n_missing_ids"),
        F.when(
            (F.col("n_rows") == F.col("n_ids"))
            & (F.col("n_ids") == F.col("max_id") - F.col("min_id") + 1),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("is_gap_free"),
    )


# ---------------------------------------------------------------------------
# Multimodal: per-pixel video motion (SAD)
# ---------------------------------------------------------------------------


def _motion_oracle() -> str:
    """Replays the 2-frame synthetic Y4M luma formulas and the per-pixel
    SAD between them."""

    def y(f: int, i: int) -> str:
        return f"((doc_id * 11 + {f} * 29 + {i} * 17) % 256)"

    sad = " + ".join(f"abs({y(1, i)} - {y(0, i)})" for i in range(4))
    mean_delta = (
        "abs(("
        + " + ".join(y(1, i) for i in range(4))
        + ") - ("
        + " + ".join(y(0, i) for i in range(4))
        + "))"
    )
    return f"""
    SELECT CAST(doc_id AS VARCHAR) AS asset_id,
           CAST(1 AS BIGINT) AS frame_idx,
           CAST({sad} AS BIGINT) AS sad,
           CAST({mean_delta} AS BIGINT) AS mean_abs_delta
    FROM documents
    """


@register(
    "multimodal_video_motion",
    _motion_oracle(),
    "Multimodal per-pixel video motion: the same synthetic 2-frame "
    "Y4M clips as multimodal_video_frames, decoded by the REAL Y4M "
    "parser, reduced to the luma-plane SAD between adjacent frames "
    "next to the |mean delta| the scene-cut detector uses — SAD "
    "catches translation motion that leaves the frame mean unchanged "
    "(pinned by a crafted behavioral test), which is why codecs and "
    "sampling heuristics estimate motion per-pixel, not per-mean. "
    "Oracle replays every |y1_i - y0_i| tap. One Arrow pass, shared "
    "quarantine policy, no shuffle.",
)
def multimodal_video_motion(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.operators.multimodal import (
        video_motion_sad,
    )

    frame_parts = []
    for f in (0, 1):
        luma_hex = F.concat(
            *[
                F.lpad(
                    F.hex((F.col("doc_id") * 11 + f * 29 + i * 17) % 256),
                    2,
                    "0",
                )
                for i in range(4)
            ]
        )
        chroma_hex = F.concat(
            F.lpad(F.hex((F.col("doc_id") * 5 + f * 3) % 256), 2, "0"),
            F.lpad(F.hex((F.col("doc_id") * 3 + f * 7) % 256), 2, "0"),
        )
        frame_parts.append(F.encode(F.lit("FRAME\n"), "utf-8"))
        frame_parts.append(F.unhex(F.concat(luma_hex, chroma_hex)))
    media = t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.lit("video").alias("media_type"),
        F.concat(
            F.encode(
                F.lit("YUV4MPEG2 W2 H2 F10:1 Ip A1:1 C420\n"), "utf-8"
            ),
            *frame_parts,
        ).alias("content"),
    )
    return video_motion_sad(media)


# ---------------------------------------------------------------------------
# SCD2 as-of lookup (time travel against the versioned dimension)
# ---------------------------------------------------------------------------

# probe instants as fractions of the corpus time span (ppm), resolved
# against min/max event time so the entry is scale-free
_SCD2_PROBE_PPM = (250000, 500000, 750000)
_SCD2_PROBE_VALUES = ", ".join(f"({p})" for p in _SCD2_PROBE_PPM)


@register(
    "scd2_asof_lookup",
    f"""
    WITH dim AS (
      SELECT user_id, event_id, event_type,
             CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
             LEAD(CAST(epoch_us(ts) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS valid_to_us
      FROM events
    ), span AS (
      SELECT CAST(MIN(epoch_us(ts)) AS BIGINT) AS lo,
             CAST(MAX(epoch_us(ts)) AS BIGINT) AS hi
      FROM events
    ), probes AS (
      SELECT p.ppm,
             s.lo + ((s.hi - s.lo) * p.ppm) // 1000000 AS at_us
      FROM (SELECT * FROM (VALUES {_SCD2_PROBE_VALUES}) v(ppm)) p, span s
    )
    SELECT p.ppm AS probe_ppm, d.user_id, d.event_id AS version_event_id,
           d.event_type AS state_at_probe
    FROM probes p
    JOIN dim d
      ON d.valid_from_us <= p.at_us
     AND (d.valid_to_us IS NULL OR d.valid_to_us > p.at_us)
    """,
    "Time travel against the SCD2 dimension scd2_build produces: for "
    "three probe instants placed at fixed fractions of the corpus "
    "time span (scale-free — no literal timestamps to rot when "
    "testdata regenerates), resolve every user's version valid AT "
    "that instant via the half-open [valid_from, valid_to) interval "
    "predicate — the point-in-time dimension lookup every "
    "fact-to-history join runs. The open-ended current version "
    "(NULL valid_to) matches any probe after its start. Interval "
    "containment on a versioned dimension is the j6_asof_join "
    "family restated as SCD2 time travel; the 3-row probe spine is "
    "a broadcast constant.",
)
def scd2_asof_lookup(spark, sf_dir):
    ev = t(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts div 1000")
    )
    wv = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    dim = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(wv).alias("valid_to_us"),
    )
    span = ev.agg(
        F.min("ts_us").cast("long").alias("lo"),
        F.max("ts_us").cast("long").alias("hi"),
    )
    probes = (
        spark.createDataFrame(
            [(p,) for p in _SCD2_PROBE_PPM], "ppm long"
        )
        .crossJoin(F.broadcast(span))
        .select(
            "ppm",
            F.expr("lo + ((hi - lo) * ppm) div 1000000").alias("at_us"),
        )
    )
    return dim.join(
        F.broadcast(probes),
        (F.col("valid_from_us") <= F.col("at_us"))
        & (
            F.col("valid_to_us").isNull()
            | (F.col("valid_to_us") > F.col("at_us"))
        ),
    ).select(
        F.col("ppm").alias("probe_ppm"),
        "user_id",
        F.col("event_id").alias("version_event_id"),
        F.col("event_type").alias("state_at_probe"),
    )


# ---------------------------------------------------------------------------
# Keyword-in-context (KWIC) concordance
# ---------------------------------------------------------------------------

_KWIC_TERM = "spark"
_KWIC_CTX = 2


@register(
    "text_kwic_concordance",
    f"""
    WITH tk AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), hits AS (
      SELECT doc_id, toks, i AS pos
      FROM tk, unnest(range(1, len(toks) + 1)) AS u(i)
      WHERE toks[i] = '{_KWIC_TERM}'
    )
    SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           -- COALESCE: an edge-of-document slice is NULL in DuckDB but
           -- an empty array (-> '') in Spark
           COALESCE(array_to_string(
             toks[GREATEST(1, pos - {_KWIC_CTX}):pos - 1], ' '), '')
             AS left_ctx,
           COALESCE(array_to_string(
             toks[pos + 1:LEAST(len(toks), pos + {_KWIC_CTX})], ' '), '')
             AS right_ctx
    FROM hits
    """,
    "Keyword-in-context concordance (the corpus linguist's KWIC view, "
    "and the snippet generator behind search-result highlighting): "
    "every occurrence of the term with its +-2-token context windows, "
    "clamped at document edges. Spark keeps the token array and "
    "slices it per hit (posexplode for positions, slice for context "
    "— no self-join back to the text); the oracle replays the same "
    "1-based slices with DuckDB list ranges. One scan, per-doc "
    "fan-out bounded by term frequency.",
)
def text_kwic_concordance(spark, sf_dir):
    hits = (
        t(spark, sf_dir, "documents")
        .select("doc_id", _toks_a().alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.posexplode("toks").alias("pos0", "tok"),
        )
        .where(F.col("tok") == _KWIC_TERM)
        .select("doc_id", "toks", (F.col("pos0") + 1).alias("pos"))
    )
    return hits.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.array_join(
            F.expr(
                f"slice(toks, GREATEST(1, pos - {_KWIC_CTX}), "
                f"pos - GREATEST(1, pos - {_KWIC_CTX}))"
            ),
            " ",
        ).alias("left_ctx"),
        F.array_join(
            F.expr(
                f"slice(toks, pos + 1, "
                f"LEAST(size(toks), pos + {_KWIC_CTX}) - pos)"
            ),
            " ",
        ).alias("right_ctx"),
    )


# ---------------------------------------------------------------------------
# Seasonal-residual anomaly detection (seasonal-naive + MAD)
# ---------------------------------------------------------------------------

_AR_MAD_K = 3


@register(
    "anomaly_seasonal_residual",
    f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ), resid AS (
      SELECT event_type, day, v,
             v - LAG(v, 7) OVER (PARTITION BY event_type ORDER BY day)
               AS r
      FROM daily
    ), scored AS (
      SELECT event_type, day, v, r, abs(r) AS ar,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY abs(r), day) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS nr
      FROM resid WHERE r IS NOT NULL
    ), mad AS (
      SELECT event_type,
             MAX(CASE WHEN rn = (nr + 1) // 2 THEN ar END) AS mad_c
      FROM scored GROUP BY event_type
    )
    SELECT s.event_type, CAST(s.day AS BIGINT) AS day, s.v, s.r AS residual_c,
           m.mad_c,
           CAST(CASE WHEN abs(s.r) > {_AR_MAD_K} * m.mad_c
                THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
    FROM scored s JOIN mad m USING (event_type)
    WHERE abs(s.r) > {_AR_MAD_K} * m.mad_c
    """,
    "Seasonal-residual anomaly detection — the composition every "
    "monitoring stack runs: deseasonalize by the seasonal-naive "
    "forecast (value minus same-weekday-last-week), then flag days "
    "whose |residual| exceeds 3x the MAD of residuals — the robust "
    "band that raw-value z-scores (grouped_zscore) and raw-value MAD "
    "(events_anomaly_mad) both get wrong on strongly weekly data, "
    "because the seasonal swing IS their 'anomaly'. MAD as the lower "
    "median of |residuals| (exact order statistic, deterministic "
    "ties); emits only the flagged days — the page-the-oncall list, "
    "not a scored firehose. One daily aggregate + lag window + one "
    "per-type order statistic.",
)
def anomaly_seasonal_residual(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import cents

    daily = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("(ts div 1000) div 86400000000").alias("day"),
            cents("value").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").cast("long").alias("v"))
    )
    wl = W.partitionBy("event_type").orderBy("day")
    resid = daily.withColumn(
        "r", F.col("v") - F.lag("v", 7).over(wl)
    ).where(F.col("r").isNotNull())
    ws = W.partitionBy("event_type").orderBy(F.abs(F.col("r")), F.col("day"))
    scored = resid.select(
        "event_type",
        "day",
        "v",
        "r",
        F.abs("r").alias("ar"),
        F.row_number().over(ws).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("nr"),
    )
    mad = scored.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(nr + 1) div 2"), F.col("ar"))
        ).alias("mad_c")
    )
    return (
        scored.join(mad, "event_type")
        .where(F.abs(F.col("r")) > _AR_MAD_K * F.col("mad_c"))
        .select(
            "event_type",
            F.col("day").cast("long").alias("day"),
            "v",
            F.col("r").alias("residual_c"),
            "mad_c",
            F.lit(1).cast("long").alias("is_anomaly"),
        )
    )


# ---------------------------------------------------------------------------
# Markov stationary distribution (unrolled power iteration)
# ---------------------------------------------------------------------------

_MK_ITERS = 4
_MK_SCALE = 1000000


def _markov_oracle() -> str:
    """Unrolled power iteration over the event-type transition matrix:
    pi_{t+1}(j) = sum_i pi_t(i) * c_ij // r_i, integer ppm with
    truncating division (the deterministic approximation both engines
    replay identically). MATERIALIZED rounds: each reads the previous
    vector once and the static matrix once."""
    steps = []
    for i in range(1, _MK_ITERS + 1):
        steps.append(f"""
    p{i} AS MATERIALIZED (
      SELECT m.dst AS state,
             CAST(SUM((p.pi * m.c) // m.r) AS BIGINT) AS pi
      FROM p{i - 1} p JOIN m ON m.src = p.state
      GROUP BY m.dst
    )""")
    return f"""
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_ns(ts), event_id) AS rn
      FROM events
    ), trans AS (
      SELECT a.event_type AS src, b.event_type AS dst
      FROM seq a JOIN seq b
        ON a.user_id = b.user_id AND b.rn = a.rn + 1
    ), m AS MATERIALIZED (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(COUNT(*)) OVER (PARTITION BY src) AS BIGINT) AS r
      FROM trans GROUP BY src, dst
    ), states AS (
      SELECT DISTINCT src AS state FROM m
    ), p0 AS MATERIALIZED (
      SELECT state,
             CAST({_MK_SCALE} // (SELECT COUNT(*) FROM states) AS BIGINT)
               AS pi
      FROM states
    ),
    {','.join(steps)}
    SELECT state AS event_type, pi AS pi_ppm FROM p{_MK_ITERS}
    """


@register(
    "markov_stationary_iter",
    _markov_oracle(),
    "Markov stationary distribution by power iteration over the "
    "event-type transition matrix event_transition_matrix builds: "
    "four unrolled rounds of pi*P in integer ppm (counts over row "
    "totals, truncating division — a deterministic approximation "
    "both engines replay bit-for-bit; exact rational iteration would "
    "blow past int64 by round 2), starting uniform. The steady-state "
    "view of user behavior that a raw frequency count ONLY matches "
    "when the chain is already mixed — on real funnels they differ, "
    "which is the point of computing it. Per round: one join of the "
    "5-vector onto the dimension-sized matrix + one aggregate; the "
    "states^2 matrix never grows with data.",
)
def markov_stationary_iter(spark, sf_dir):
    seq = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.row_number()
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    a, b = seq.alias("a"), seq.alias("b")
    trans = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.rn") == F.col("a.rn") + 1),
    ).select(
        F.col("a.event_type").alias("src"),
        F.col("b.event_type").alias("dst"),
    )
    m = (
        trans.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn(
            "r", F.sum("c").over(W.partitionBy("src")).cast("long")
        )
        .localCheckpoint(eager=False)
    )
    states = m.select(F.col("src").alias("state")).distinct()
    n_states = states.agg(F.count(F.lit(1)).alias("ns"))
    pi = (
        states.crossJoin(F.broadcast(n_states))
        .select(
            "state",
            F.expr(f"CAST({_MK_SCALE} div ns AS BIGINT)").alias("pi"),
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(_MK_ITERS):
        # linear recurrence (pi referenced once per round) — no
        # per-round lineage cut needed, the pagerank_integer doctrine;
        # only the reused transition matrix m is checkpointed above
        pi = (
            m.join(pi, m["src"] == pi["state"])
            .groupBy(F.col("dst").alias("state2"))
            .agg(
                F.sum(F.expr("(pi * c) div r")).cast("long").alias("pi")
            )
            .select(F.col("state2").alias("state"), "pi")
        )
    return pi.select(
        F.col("state").alias("event_type"), F.col("pi").alias("pi_ppm")
    )


# ---------------------------------------------------------------------------
# Unnormalized Haar wavelet decomposition of the daily series
# ---------------------------------------------------------------------------

_HAAR_N = 8  # first 8 days -> 3 levels


def _haar_oracle() -> str:
    """Replays the 3-level unnormalized Haar pyramid over the first 8
    daily totals: level sums/differences only — no division, fully
    integer-exact."""
    # x0..x7 columns, then 3 unrolled levels
    xs = ", ".join(
        f"MAX(CASE WHEN rn = {i + 1} THEN v END) AS x{i}"
        for i in range(_HAAR_N)
    )
    l1 = ", ".join(
        [f"(x{2*i} + x{2*i+1}) AS a1_{i}" for i in range(4)]
        + [f"(x{2*i} - x{2*i+1}) AS d1_{i}" for i in range(4)]
    )
    l2 = ", ".join(
        [f"(a1_{2*i} + a1_{2*i+1}) AS a2_{i}" for i in range(2)]
        + [f"(a1_{2*i} - a1_{2*i+1}) AS d2_{i}" for i in range(2)]
    )
    l3 = "(a2_0 + a2_1) AS a3_0, (a2_0 - a2_1) AS d3_0"
    outs = (
        ["('a3', 0, a3_0)", "('d3', 0, d3_0)"]
        + [f"('d2', {i}, d2_{i})" for i in range(2)]
        + [f"('d1', {i}, d1_{i})" for i in range(4)]
    )
    unions = " UNION ALL ".join(
        f"SELECT event_type, {o[1:-1].split(',')[0]} AS coef, "
        f"CAST({o[1:-1].split(',')[1]} AS BIGINT) AS idx, "
        f"CAST({o[1:-1].split(',')[2]} AS BIGINT) AS value_c FROM lvl3"
        for o in outs
    )
    return f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ), ranked AS (
      SELECT event_type, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
               AS rn
      FROM daily
    ), wide AS (
      SELECT event_type, {xs}
      FROM ranked WHERE rn <= {_HAAR_N} GROUP BY event_type
    ), lvl1 AS (SELECT event_type, {l1} FROM wide),
    lvl2 AS (SELECT event_type, d1_0, d1_1, d1_2, d1_3, {l2} FROM lvl1),
    lvl3 AS (SELECT event_type, d1_0, d1_1, d1_2, d1_3, d2_0, d2_1, {l3}
             FROM lvl2)
    {unions}
    """


@register(
    "haar_transform_daily",
    _haar_oracle(),
    "Unnormalized Haar wavelet pyramid over each type's first 8 daily "
    "cent totals: pairwise sums (approximation) and differences "
    "(detail) across 3 levels — NO division anywhere, so the "
    "multiresolution coefficients are fully integer-exact in both "
    "engines (the normalized transform's sqrt(2) factors are exactly "
    "what cross-engine float math cannot replay). a3_0 is the total "
    "over the window, d3_0 the half-vs-half contrast, d2_* the "
    "2-day-block contrasts, d1_* the day-pair contrasts — the "
    "wavelet synopsis classic histogram/approximate-query papers "
    "(Matias-Vitter-Wang) build on, and the energy-by-level readout "
    "that separates trend from daily noise. One daily aggregate + a "
    "per-type 8-slot pivot + pure column arithmetic.",
)
def haar_transform_daily(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import cents

    daily = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("(ts div 1000) div 86400000000").alias("day"),
            cents("value").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").cast("long").alias("v"))
    )
    wr = W.partitionBy("event_type").orderBy("day")
    wide = (
        daily.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") <= _HAAR_N)
        .groupBy("event_type")
        .agg(
            *[
                F.max(
                    F.when(F.col("rn") == i + 1, F.col("v"))
                ).alias(f"x{i}")
                for i in range(_HAAR_N)
            ]
        )
    )
    lvl = wide
    for i in range(4):
        lvl = lvl.withColumn(f"a1_{i}", F.col(f"x{2*i}") + F.col(f"x{2*i+1}"))
        lvl = lvl.withColumn(f"d1_{i}", F.col(f"x{2*i}") - F.col(f"x{2*i+1}"))
    for i in range(2):
        lvl = lvl.withColumn(
            f"a2_{i}", F.col(f"a1_{2*i}") + F.col(f"a1_{2*i+1}")
        )
        lvl = lvl.withColumn(
            f"d2_{i}", F.col(f"a1_{2*i}") - F.col(f"a1_{2*i+1}")
        )
    lvl = lvl.withColumn("a3_0", F.col("a2_0") + F.col("a2_1"))
    lvl = lvl.withColumn("d3_0", F.col("a2_0") - F.col("a2_1"))
    outs = (
        [("a3", 0, "a3_0"), ("d3", 0, "d3_0")]
        + [("d2", i, f"d2_{i}") for i in range(2)]
        + [("d1", i, f"d1_{i}") for i in range(4)]
    )
    frames = [
        lvl.select(
            "event_type",
            F.lit(name).alias("coef"),
            F.lit(idx).cast("long").alias("idx"),
            F.col(col).cast("long").alias("value_c"),
        )
        for name, idx, col in outs
    ]
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionAll(fdf)
    return out


# ---------------------------------------------------------------------------
# AMS second-frequency-moment (F2) sketch
# ---------------------------------------------------------------------------

_AMS_ESTIMATORS = 8


@register(
    "sketch_ams_f2",
    f"""
    WITH tk AS (
      SELECT unnest({_TOKS_SQL}) AS tok FROM documents
    ), cnt AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tk GROUP BY tok
    ), est AS (
      SELECT j.j,
             CAST(SUM(CASE WHEN
               {_H32_DUCK.format(s="cnt.tok || '#' || CAST(j.j AS VARCHAR)")}
               % 2 = 0 THEN cnt.c ELSE -cnt.c END) AS BIGINT) AS s
      FROM cnt, (SELECT unnest(range({_AMS_ESTIMATORS})) AS j) j
      GROUP BY j.j
    ), agg AS (
      SELECT CAST(SUM(s * s) // {_AMS_ESTIMATORS} AS BIGINT) AS f2_est
      FROM est
    ), ex AS (
      SELECT CAST(SUM(c * c) AS BIGINT) AS f2_exact FROM cnt
    )
    SELECT agg.f2_est, ex.f2_exact,
           CAST((1000000 * agg.f2_est) // ex.f2_exact AS BIGINT)
             AS ratio_ppm
    FROM agg, ex
    """,
    "AMS second-frequency-moment sketch (Alon-Matias-Szegedy 1996, "
    "the Godel-prize streaming estimator): eight +-1 hash estimators "
    "each fold the token counts into one signed sum, F2_est = "
    "mean(s^2) against the exact sum(c^2) audit — self-join sizing "
    "and skew detection from CONSTANT state per estimator, the "
    "theoretical ancestor of every sketch in this engine's kmv/theta/"
    "cms family. Deterministic md5 parities replace the 4-wise "
    "independent seeds, so both engines replay the identical "
    "estimate; the vocabulary aggregate is the only shuffle and the "
    "8-way estimator spine collapses map-side.",
)
def sketch_ams_f2(spark, sf_dir):
    cnt = (
        t(spark, sf_dir, "documents")
        .select(F.explode(_toks_a()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    js = spark.range(0, _AMS_ESTIMATORS).select(F.col("id").alias("j"))
    sign_h = _H32_SPARK.format(s="concat(tok, '#', cast(j as string))")
    est = (
        cnt.crossJoin(F.broadcast(js))
        .select(
            "j",
            F.expr(
                f"CASE WHEN {sign_h} % 2 = 0 THEN c ELSE -c END"
            ).alias("sc"),
        )
        .groupBy("j")
        .agg(F.sum("sc").cast("long").alias("s"))
    )
    agg = est.agg(
        F.expr(
            f"CAST(SUM(s * s) div {_AMS_ESTIMATORS} AS BIGINT)"
        ).alias("f2_est")
    )
    ex = cnt.agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("f2_exact"))
    return agg.crossJoin(F.broadcast(ex)).select(
        "f2_est",
        "f2_exact",
        F.expr(
            "CAST((1000000 * f2_est) div f2_exact AS BIGINT)"
        ).alias("ratio_ppm"),
    )


# ---------------------------------------------------------------------------
# Longest increasing subsequence (per user, capped, unrolled DP)
# ---------------------------------------------------------------------------

_LIS_CAP = 12     # first N events per user
_LIS_ROUNDS = 12  # LIS length <= cap, so cap rounds always reach fixpoint


def _lis_oracle() -> str:
    """Unrolled DP: lis_r(j) = max(lis_{r-1}(j), 1 + max over
    precedence edges (i -> j)). MATERIALIZED rounds: each reads the
    previous vector twice (carry + relax) plus the static edge set."""
    steps = []
    for r in range(1, _LIS_ROUNDS + 1):
        steps.append(f"""
    l{r} AS MATERIALIZED (
      SELECT user_id, j, MAX(v) AS v FROM (
        SELECT user_id, j, v FROM l{r - 1}
        UNION ALL
        SELECT e.user_id, e.j, p.v + 1
        FROM prec e JOIN l{r - 1} p
          ON p.user_id = e.user_id AND p.j = e.i
      ) GROUP BY user_id, j
    )""")
    return f"""
    WITH w AS (
      SELECT user_id,
             CAST(ROUND(value * 100) AS BIGINT) AS val,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_ns(ts), event_id) AS rn
      FROM events
    ), cap AS MATERIALIZED (
      SELECT user_id, val, rn FROM w WHERE rn <= {_LIS_CAP}
    ), prec AS MATERIALIZED (
      SELECT a.user_id, a.rn AS i, b.rn AS j
      FROM cap a JOIN cap b
        ON a.user_id = b.user_id AND a.rn < b.rn AND a.val < b.val
    ), l0 AS MATERIALIZED (
      SELECT user_id, rn AS j, CAST(1 AS BIGINT) AS v FROM cap
    ),
    {','.join(steps)}
    SELECT user_id, CAST(MAX(v) AS BIGINT) AS lis_len
    FROM l{_LIS_ROUNDS} GROUP BY user_id
    """


@register(
    "seq_lis_length",
    _lis_oracle(),
    "Longest strictly-increasing subsequence of each user's value "
    "series (first 12 events — the pass@k capping discipline bounds "
    "both the precedence pairs at 66/user and the DP rounds): the "
    "classic sequence-analytics measure of monotone structure vs "
    "churn (LIS near n = steady growth; near 1 = no persistent "
    "trend), computed as an unrolled DP fixpoint — lis(j) relaxes "
    "over the strict (earlier, smaller) precedence edges one "
    "extension per round, monotone nondecreasing, so 12 rounds "
    "provably reach the fixpoint and the unrolled-CTE oracle "
    "replays the exact prefix. Per round: one equi-join of the DP "
    "vector onto the static capped edge set + one max aggregate "
    "(the pagerank doctrine on a DAG).",
)
def seq_lis_length(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import cents

    w = t(spark, sf_dir, "events").select(
        "user_id",
        cents("value").alias("val"),
        F.row_number()
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    cap = w.where(F.col("rn") <= _LIS_CAP).localCheckpoint(eager=False)
    a, b = cap.alias("a"), cap.alias("b")
    prec = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.rn") < F.col("b.rn"))
            & (F.col("a.val") < F.col("b.val")),
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.rn").alias("i"),
            F.col("b.rn").alias("j"),
        )
        .localCheckpoint(eager=False)
    )
    lis = cap.select(
        "user_id", F.col("rn").alias("j"), F.lit(1).cast("long").alias("v")
    ).localCheckpoint(eager=False)
    for r in range(_LIS_ROUNDS):
        relaxed = prec.join(
            lis,
            (prec["user_id"] == lis["user_id"]) & (prec["i"] == lis["j"]),
        ).select(
            prec["user_id"].alias("user_id"),
            prec["j"].alias("j"),
            (lis["v"] + 1).alias("v"),
        )
        lis = (
            lis.unionAll(relaxed)
            .groupBy("user_id", "j")
            .agg(F.max("v").alias("v"))
        )
        if r % 2 == 1:
            lis = lis.localCheckpoint(eager=False)
    return lis.groupBy("user_id").agg(
        F.max("v").cast("long").alias("lis_len")
    )


# ---------------------------------------------------------------------------
# Exact 0/1 knapsack (unrolled DP) vs density-greedy budget selection
# ---------------------------------------------------------------------------

_KS_ITEMS = 12
_KS_CAP = 24


def _knapsack_oracle() -> str:
    """Unrolled item rounds over the capacity-indexed DP vector:
    best_i(c) = max(best_{i-1}(c), best_{i-1}(c - w_i) + v_i)."""
    steps = []
    for r in range(1, _KS_ITEMS + 1):
        steps.append(f"""
    b{r} AS MATERIALIZED (
      SELECT c, MAX(v) AS v FROM (
        SELECT c, v FROM b{r - 1}
        UNION ALL
        SELECT p.c + it.w AS c, p.v + it.val AS v
        FROM b{r - 1} p JOIN items it ON it.rn = {r}
        WHERE p.c + it.w <= {_KS_CAP}
      ) GROUP BY c
    )""")
    return f"""
    WITH docs12 AS (
      SELECT doc_id,
             CAST(len(list_distinct({_TOKS_SQL})) AS BIGINT) AS val,
             CAST(len({_TOKS_SQL}) // 8 + 1 AS BIGINT) AS w
      FROM documents ORDER BY doc_id LIMIT {_KS_ITEMS}
    ), items AS MATERIALIZED (
      SELECT doc_id, val, w,
             ROW_NUMBER() OVER (ORDER BY doc_id) AS rn
      FROM docs12
    ), b0 AS MATERIALIZED (
      SELECT CAST(0 AS BIGINT) AS c, CAST(0 AS BIGINT) AS v
    ),
    {','.join(steps)},
    greedy AS (
      SELECT COALESCE(SUM(val), 0) AS gv FROM (
        SELECT val,
               SUM(w) OVER (ORDER BY (1000 * val) // w DESC, doc_id
                            ROWS UNBOUNDED PRECEDING) AS run_w
        FROM items
      ) WHERE run_w <= {_KS_CAP}
    )
    SELECT CAST({_KS_CAP} AS BIGINT) AS capacity,
           CAST({_KS_ITEMS} AS BIGINT) AS n_items,
           (SELECT CAST(MAX(v) AS BIGINT) FROM b{_KS_ITEMS})
             AS optimal_value,
           (SELECT CAST(gv AS BIGINT) FROM greedy) AS greedy_value
    """


@register(
    "budget_knapsack_optimal",
    _knapsack_oracle(),
    "EXACT 0/1 knapsack vs the density-greedy heuristic "
    "corpus_budget_select uses — the audit that quantifies what the "
    "greedy budget selection leaves on the table: 12 candidate "
    "documents (value = distinct tokens, weight = token-count band) "
    "against capacity 24, solved by the unrolled capacity-indexed DP "
    "(one relax round per item — the Bellman recurrence as 12 "
    "MATERIALIZED CTE rounds, DP vector never exceeding capacity+1 "
    "rows) next to the prefix-density greedy (take in value/weight "
    "order while the running weight fits; the prefix rule, not "
    "skip-and-continue, so it stays window-expressible — stated "
    "contract). optimal >= greedy always; the gap is the price of "
    "the heuristic. The item cap bounds DP work at any corpus "
    "scale; selecting WHICH 12 candidates is the upstream sampler's "
    "job.",
)
def budget_knapsack_optimal(spark, sf_dir):
    toks = _toks_a()
    docs12 = (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(F.array_distinct(toks)).cast("long").alias("val"),
            (F.size(toks) / 8).cast("long").alias("_wb"),
        )
        .select("doc_id", "val", (F.col("_wb") + 1).alias("w"))
        .orderBy("doc_id")
        .limit(_KS_ITEMS)
    )
    items = docs12.withColumn(
        "rn", F.row_number().over(W.orderBy("doc_id"))
    ).localCheckpoint(eager=False)
    best = spark.createDataFrame([(0, 0)], "c long, v long")
    for r in range(1, _KS_ITEMS + 1):
        it = items.where(F.col("rn") == r).select("w", "val")
        shifted = (
            best.crossJoin(F.broadcast(it))
            .where(F.col("c") + F.col("w") <= _KS_CAP)
            .select(
                (F.col("c") + F.col("w")).alias("c"),
                (F.col("v") + F.col("val")).alias("v"),
            )
        )
        best = (
            best.unionAll(shifted)
            .groupBy("c")
            .agg(F.max("v").alias("v"))
        )
        if r % 3 == 0:
            best = best.localCheckpoint(eager=False)
    optimal = best.agg(F.max("v").cast("long").alias("optimal_value"))
    wg = W.orderBy(
        F.desc(F.expr("(1000 * val) div w")), F.asc("doc_id")
    ).rowsBetween(W.unboundedPreceding, 0)
    greedy = (
        items.withColumn("run_w", F.sum("w").over(wg))
        .where(F.col("run_w") <= _KS_CAP)
        .agg(
            F.coalesce(F.sum("val"), F.lit(0))
            .cast("long")
            .alias("greedy_value")
        )
    )
    return (
        optimal.crossJoin(F.broadcast(greedy))
        .select(
            F.lit(_KS_CAP).cast("long").alias("capacity"),
            F.lit(_KS_ITEMS).cast("long").alias("n_items"),
            "optimal_value",
            "greedy_value",
        )
    )


# ---------------------------------------------------------------------------
# Rich-club coefficient of the mutual-kNN graph
# ---------------------------------------------------------------------------

_RC_TOP = 20


def _rich_club_oracle() -> str:
    return f"""
    WITH {_mutual_cte_sql("mut")}, deg AS (
      SELECT src AS node, COUNT(*) AS d FROM mut GROUP BY 1
    ), club AS MATERIALIZED (
      SELECT node FROM deg ORDER BY d DESC, node LIMIT {_RC_TOP}
    ), internal AS (
      SELECT COUNT(*) AS e2  -- symmetric edges: 2x undirected count
      FROM mut
      JOIN club ca ON ca.node = mut.src
      JOIN club cb ON cb.node = mut.dst
    )
    SELECT CAST({_RC_TOP} AS BIGINT) AS club_size,
           CAST(e2 // 2 AS BIGINT) AS internal_edges,
           CAST({_RC_TOP * (_RC_TOP - 1) // 2} AS BIGINT)
             AS possible_edges,
           -- all-integer: DOUBLE // rounds differently than BIGINT div
           CAST((1000000 * CAST(e2 // 2 AS BIGINT))
                // {_RC_TOP * (_RC_TOP - 1) // 2} AS BIGINT) AS phi_ppm
    FROM internal
    """


@register(
    "graph_rich_club",
    _rich_club_oracle(),
    "Rich-club coefficient (Zhou & Mondragon 2004) of the mutual-kNN "
    "embedding graph: take the 20 highest-degree vertices (ties to "
    "the smaller id), count the edges they keep among THEMSELVES, "
    "and report phi = internal / possible in ppm — do the hubs form "
    "their own dense club (hub-and-spoke redundancy, a structural "
    "health read on the manifold) or spread their links outward? "
    "One degree aggregate + a 20-row broadcast club + two semi-join "
    "legs; symmetric edges counted once by halving. Round 7: runs on "
    "the BOUNDED IVF-pivot mutual-kNN build (_mutual_knn_edges), "
    "never all-pairs. Completes the structural family with kcore "
    "(vertex peel) and ktruss (edge peel) on the same graph.",
)
def graph_rich_club(spark, sf_dir):
    mutual = _mutual_knn_edges(spark, sf_dir).localCheckpoint(eager=False)
    deg = mutual.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    club = (
        deg.orderBy(F.desc("d"), F.asc("node"))
        .limit(_RC_TOP)
        .select("node")
        .localCheckpoint(eager=False)
    )
    internal = (
        mutual.join(
            club.withColumnRenamed("node", "ca"),
            F.col("src") == F.col("ca"),
            "left_semi",
        )
        .join(
            club.withColumnRenamed("node", "cb"),
            F.col("dst") == F.col("cb"),
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("e2"))
    )
    possible = _RC_TOP * (_RC_TOP - 1) // 2
    return internal.select(
        F.lit(_RC_TOP).cast("long").alias("club_size"),
        F.expr("CAST(e2 / 2 AS BIGINT)").alias("internal_edges"),
        F.lit(possible).cast("long").alias("possible_edges"),
        F.expr(
            f"CAST((1000000 * (e2 div 2)) div {possible} AS BIGINT)"
        ).alias("phi_ppm"),
    )


# ---------------------------------------------------------------------------
# Flajolet-Martin rho-max distinct sketch (the HLL ancestor)
# ---------------------------------------------------------------------------


@register(
    "sketch_fm_rho_max",
    f"""
    WITH e AS (
      SELECT DISTINCT CAST(user_id AS VARCHAR) || ':' ||
             CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS s
      FROM events
    ), hv AS (
      SELECT {_H32_DUCK.format(s="s")} AS h FROM e
    ), rho AS (
      -- rho = 1-based position of the lowest set bit: h & -h isolates
      -- it, length(bin(.)) reads its position; h = 0 cannot occur for
      -- md5-32 of distinct nonempty strings but is guarded anyway
      SELECT CASE WHEN h = 0 THEN 33
                  ELSE length(bin(h & (-h))) END AS rho
      FROM hv
    ), agg AS (
      SELECT CAST(MAX(rho) AS BIGINT) AS max_rho FROM rho
    ), ex AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_distinct FROM e
    )
    SELECT agg.max_rho,
           CAST(1 AS BIGINT) << agg.max_rho AS fm_raw_estimate,
           ex.exact_distinct
    FROM agg, ex
    """,
    "Flajolet-Martin rho-max distinct sketch (1985 — the ancestor "
    "HyperLogLog refined): the maximum 1-based position of the lowest "
    "set hash bit over the user-day set, with 2^max_rho as the raw "
    "estimate next to the exact count — a SINGLE MAX is the whole "
    "sketch state, the most mergeable summary there is, and exactly "
    "why the family scales (a14_approx_distinct is the production "
    "HLL; kmv/theta are the order-statistics cousins; this entry is "
    "the lineage's root, bias and all — raw FM is expected ~2^rho/"
    "0.775, so the estimate reads high by design). Bit position via "
    "h & -h then length(bin(.)) — identical integer semantics in "
    "both engines, no float log2.",
)
def sketch_fm_rho_max(spark, sf_dir):
    e = (
        t(spark, sf_dir, "events")
        .select(
            F.concat_ws(
                ":",
                F.col("user_id").cast("string"),
                F.expr("(ts div 1000) div 86400000000").cast("string"),
            ).alias("s")
        )
        .distinct()
    )
    hv = e.select(F.expr(_H32_SPARK.format(s="s")).alias("h"))
    rho = hv.select(
        F.expr(
            "CASE WHEN h = 0 THEN 33 "
            "ELSE length(bin(h & (-h))) END"
        ).alias("rho")
    )
    agg = rho.agg(F.max("rho").cast("long").alias("max_rho"))
    ex = e.agg(F.count(F.lit(1)).cast("long").alias("exact_distinct"))
    return agg.crossJoin(F.broadcast(ex)).select(
        "max_rho",
        F.expr("CAST(shiftleft(1L, cast(max_rho as int)) AS BIGINT)").alias(
            "fm_raw_estimate"
        ),
        "exact_distinct",
    )


# ---------------------------------------------------------------------------
# Weekday seasonality profile
# ---------------------------------------------------------------------------


@register(
    "weekday_profile",
    """
    WITH d AS (
      SELECT event_type,
             (epoch_us(ts) // 86400000000 + 4) % 7 AS weekday,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events
    ), agg AS (
      SELECT event_type, weekday,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(c) AS BIGINT) AS total_c
      FROM d GROUP BY 1, 2
    )
    SELECT event_type, CAST(weekday AS BIGINT) AS weekday, n_events,
           total_c,
           CAST((1000000 * total_c)
                // SUM(total_c) OVER (PARTITION BY event_type) AS BIGINT)
             AS share_ppm
    FROM agg
    """,
    "Weekday seasonality profile: per (type, weekday) event counts "
    "and cent totals with each weekday's ppm share of its type — the "
    "profile that justifies (or kills) the lag-7 seasonal-naive "
    "baseline forecast_seasonal_naive_mae scores against. Weekday "
    "from pure epoch-day arithmetic ((day + 4) % 7, Thursday-epoch "
    "corrected so 0 = Sunday) — no calendar/timezone functions, so "
    "both engines agree on every boundary. One aggregate + one "
    "dimension-sized share window.",
)
def weekday_profile(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import cents

    d = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("((ts div 1000) div 86400000000 + 4) % 7").alias("weekday"),
        cents("value").alias("c"),
    )
    agg = d.groupBy("event_type", "weekday").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("c").cast("long").alias("total_c"),
    )
    wt = W.partitionBy("event_type")
    return agg.select(
        "event_type",
        F.col("weekday").cast("long").alias("weekday"),
        "n_events",
        "total_c",
        F.expr(
            "CAST((1000000 * total_c) div "
            "SUM(total_c) OVER (PARTITION BY event_type) AS BIGINT)"
        ).alias("share_ppm"),
    )


# ---------------------------------------------------------------------------
# Source-level vocabulary Jaccard matrix
# ---------------------------------------------------------------------------


@register(
    "source_token_jaccard",
    f"""
    WITH st AS (
      SELECT DISTINCT source, tok
      FROM (SELECT source, unnest({_TOKS_SQL}) AS tok FROM documents)
    ), sz AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM st GROUP BY 1
    ), inter AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b, i.n_common,
           sa.n AS n_a, sb.n AS n_b,
           CAST((1000000 * i.n_common)
                // (sa.n + sb.n - i.n_common) AS BIGINT) AS jaccard_ppm
    FROM inter i
    JOIN sz sa ON sa.source = i.src_a
    JOIN sz sb ON sb.source = i.src_b
    """,
    "Source-level vocabulary overlap: pairwise Jaccard (ppm) between "
    "every two sources' DISTINCT token sets — the corpus-comparison "
    "grain above document dedup (dedup_* compare documents; this "
    "compares COLLECTIONS), the first read when deciding whether two "
    "feeds are redundant mirrors or complementary. The intersection "
    "is a token-keyed self-join of the source-token incidence (never "
    "source x source x docs), sizes join back by key — "
    "dimension-bounded end to end: |sources|^2 output no matter the "
    "corpus size.",
)
def source_token_jaccard(spark, sf_dir):
    st = (
        t(spark, sf_dir, "documents")
        .select("source", F.explode(_toks_a()).alias("tok"))
        .distinct()
    )
    sz = st.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a, b = st.alias("a"), st.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        inter.join(
            sz.withColumnRenamed("source", "src_a").withColumnRenamed(
                "n", "n_a"
            ),
            "src_a",
        )
        .join(
            sz.withColumnRenamed("source", "src_b").withColumnRenamed(
                "n", "n_b"
            ),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_common",
            "n_a",
            "n_b",
            F.expr(
                "CAST((1000000 * n_common) div (n_a + n_b - n_common) "
                "AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Entity clusters: ER match pairs closed into components
# ---------------------------------------------------------------------------


def _er_clusters_oracle(sf_dir: str | None = None) -> str:
    """Composes the registered ER-scoring oracle with a recursive
    transitive closure (the dedup_components doctrine)."""
    from youtube_trending_data_pipeline_spark.catalog import QUERIES

    er = QUERIES["er_blocked_match_score"].oracle
    return f"""
    WITH RECURSIVE matches AS (
      SELECT a_key, b_key FROM ({er}) m
    ),
    edges AS (
      SELECT a_key AS src, b_key AS dst FROM matches
      UNION
      SELECT b_key, a_key FROM matches
    ),
    reach(node, root) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (
      SELECT node, MIN(root) AS entity_id FROM reach GROUP BY node
    )
    SELECT CAST(node AS BIGINT) AS c_custkey,
           CAST(entity_id AS BIGINT) AS entity_id,
           CAST(COUNT(*) OVER (PARTITION BY entity_id) AS BIGINT)
             AS cluster_size
    FROM comp
    """


@register(
    "er_entity_clusters",
    _er_clusters_oracle,
    "End-to-end record linkage: the Fellegi-Sunter match pairs from "
    "er_blocked_match_score closed into ENTITIES by connected "
    "components (if A matches B and B matches C, all three are one "
    "entity even when A-C never scored above threshold — the "
    "transitive step every MDM/golden-record system runs after "
    "scoring). Spark composes the registered scoring entry with the "
    "large-star/small-star CC operator (operators/components.py, "
    "O(log n) rounds); the oracle composes the registered scoring "
    "SQL with a recursive-CTE closure — both sides reuse the exact "
    "artifacts they are built from, the sim_pq_recall_audit "
    "composition doctrine. Output: every matched customer with its "
    "canonical entity id (min member key) and cluster size.",
)
def er_entity_clusters(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import QUERIES
    from youtube_trending_data_pipeline_spark.operators.components import (
        connected_components,
    )

    pairs = QUERIES["er_blocked_match_score"].fn(spark, sf_dir).select(
        F.col("a_key").alias("src"), F.col("b_key").alias("dst")
    )
    comp = connected_components(pairs)
    wc = W.partitionBy("component")
    return comp.select(
        F.col("node").cast("long").alias("c_custkey"),
        F.col("component").cast("long").alias("entity_id"),
        F.count(F.lit(1)).over(wc).cast("long").alias("cluster_size"),
    )


# ---------------------------------------------------------------------------
# Optimal Huffman code lengths (bounded vocabulary dimension)
# ---------------------------------------------------------------------------


def _huffman_lengths(counts: list[tuple[str, int]]) -> dict[str, int]:
    """Reference Huffman with total deterministic tie-breaking: the heap
    orders by (weight, min-member-token), so equal-weight merges are a
    pure function of the data. Returns token -> code length."""
    import heapq

    if len(counts) == 1:
        return {counts[0][0]: 1}
    heap = [(c, tok, {tok: 0}) for tok, c in counts]
    heapq.heapify(heap)
    while len(heap) > 1:
        c1, k1, m1 = heapq.heappop(heap)
        c2, k2, m2 = heapq.heappop(heap)
        merged = {t: d + 1 for t, d in m1.items()}
        merged.update({t: d + 1 for t, d in m2.items()})
        heapq.heappush(heap, (c1 + c2, min(k1, k2), merged))
    return heap[0][2]


def _huffman_oracle(sf_dir: str | None = None) -> str:
    """GENERATED oracle (the _pca_oracle_sql doctrine): DuckDB reads the
    same parquet, the reference Huffman (deterministic tie-breaks) runs
    outside Spark, and the emitted SQL verifies BOTH the recomputed
    token counts and the embedded optimal lengths — count drift or any
    Spark-side plumbing error breaks the join."""
    import os

    import duckdb

    sf = sf_dir or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
          SELECT unnest({_TOKS_SQL}) AS tok
          FROM '{sf}/documents.parquet'
        ) GROUP BY tok
        """
    ).fetchall()
    lengths = _huffman_lengths([(t, c) for t, c in rows])
    values = ", ".join(f"('{t}', {l})" for t, l in sorted(lengths.items()))
    return f"""
    WITH cnt AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT unnest({_TOKS_SQL}) AS tok FROM documents
      ) GROUP BY tok
    ), hl(tok, code_bits) AS (VALUES {values})
    SELECT cnt.tok, cnt.c, CAST(hl.code_bits AS BIGINT) AS code_bits,
           CAST(cnt.c * hl.code_bits AS BIGINT) AS weighted_bits
    FROM cnt JOIN hl USING (tok)
    """


@register(
    "token_huffman_code_audit",
    _huffman_oracle,
    "OPTIMAL Huffman code lengths for the token vocabulary — the "
    "exact answer token_shannon_code_audit upper-bounds: the "
    "vocabulary is a BOUNDED DIMENSION (the PCA d-by-d doctrine), so "
    "the counts aggregate distributes, the 31-symbol Huffman build "
    "runs driver-side with total deterministic tie-breaking (heap "
    "ordered by (weight, min member token) — equal-weight merges are "
    "a pure function of the data), and the lengths broadcast-join "
    "back. The generated oracle re-derives counts AND the reference "
    "Huffman outside Spark (the _pca_oracle_sql pattern) and verifies "
    "both. Behavioral tests pin the Kraft EQUALITY (sum 2^-L == 1, "
    "which Shannon codes only bound) and optimality <= the Shannon "
    "audit's weighted bits.",
)
def token_huffman_code_audit(spark, sf_dir):
    cnt = (
        t(spark, sf_dir, "documents")
        .select(F.explode(_toks_a()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    counts = [(r["tok"], r["c"]) for r in cnt.collect()]
    lengths = _huffman_lengths(counts)
    hl = spark.createDataFrame(
        sorted(lengths.items()), "tok string, code_bits long"
    )
    return cnt.join(F.broadcast(hl), "tok").select(
        "tok",
        "c",
        "code_bits",
        (F.col("c") * F.col("code_bits")).cast("long").alias("weighted_bits"),
    )


# ---------------------------------------------------------------------------
# Cohen's kappa between two annotation heuristics
# ---------------------------------------------------------------------------


@register(
    "eval_cohens_kappa",
    f"""
    WITH lab AS (
      SELECT doc_id,
             CASE WHEN n_chars >= 300 THEN 'long'
                  WHEN n_chars >= 150 THEN 'mid' ELSE 'short' END AS a,
             CASE WHEN len(list_distinct({_TOKS_SQL})) >= 28 THEN 'long'
                  WHEN len(list_distinct({_TOKS_SQL})) >= 20 THEN 'mid'
                  ELSE 'short' END AS b
      FROM documents
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lab),
    agree AS (
      SELECT CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS po
      FROM lab
    ), marg AS (
      SELECT CAST(SUM(na * nb) AS BIGINT) AS pe_num FROM (
        SELECT COALESCE(ma.c, 0) AS na, COALESCE(mb.c, 0) AS nb
        FROM (SELECT a AS k, COUNT(*) AS c FROM lab GROUP BY 1) ma
        FULL OUTER JOIN (SELECT b AS k, COUNT(*) AS c FROM lab GROUP BY 1) mb
          USING (k)
      )
    )
    SELECT n.n, agree.po AS n_agree,
           CAST((1000000 * agree.po) // n.n AS BIGINT) AS po_ppm,
           CAST((1000000 * marg.pe_num) // (n.n * n.n) AS BIGINT) AS pe_ppm,
           CAST((1000000 * (agree.po * n.n - marg.pe_num))
                // (n.n * n.n - marg.pe_num) AS BIGINT) AS kappa_ppm
    FROM n, agree, marg
    """,
    "Cohen's kappa (1960) between two annotation heuristics — the "
    "inter-annotator-agreement number every labeling pipeline "
    "reports before trusting its labels: a char-length bander and a "
    "vocabulary-richness bander each assign short/mid/long, observed "
    "agreement is corrected by the chance agreement the marginals "
    "imply, all in EXACT integer arithmetic (kappa = (po*n - pe_num)"
    " / (n^2 - pe_num) scaled to ppm — no float probabilities, both "
    "engines agree to the last ppm). Full-outer marginal join keeps "
    "labels one annotator never uses. One scan + two tiny "
    "aggregates; chance-corrected agreement is what separates a "
    "real rubric from two heuristics that agree by accident.",
)
def eval_cohens_kappa(spark, sf_dir):
    toks = _toks_a()
    lab = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("n_chars") >= 300, "long")
        .when(F.col("n_chars") >= 150, "mid")
        .otherwise("short")
        .alias("a"),
        F.when(F.size(F.array_distinct(toks)) >= 28, "long")
        .when(F.size(F.array_distinct(toks)) >= 20, "mid")
        .otherwise("short")
        .alias("b"),
    )
    n = lab.agg(F.count(F.lit(1)).cast("long").alias("n"))
    agree = lab.agg(
        F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("po")
    )
    ma = lab.groupBy(F.col("a").alias("k")).agg(
        F.count(F.lit(1)).alias("na")
    )
    mb = lab.groupBy(F.col("b").alias("k")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    marg = (
        ma.join(mb, "k", "full_outer")
        .select(
            (
                F.coalesce("na", F.lit(0)) * F.coalesce("nb", F.lit(0))
            ).alias("prod")
        )
        .agg(F.sum("prod").cast("long").alias("pe_num"))
    )
    return (
        n.crossJoin(F.broadcast(agree))
        .crossJoin(F.broadcast(marg))
        .select(
            "n",
            F.col("po").alias("n_agree"),
            F.expr("CAST((1000000 * po) div n AS BIGINT)").alias("po_ppm"),
            F.expr(
                "CAST((1000000 * pe_num) div (n * n) AS BIGINT)"
            ).alias("pe_ppm"),
            F.expr(
                "CAST((1000000 * (po * n - pe_num)) div (n * n - pe_num) "
                "AS BIGINT)"
            ).alias("kappa_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Total-variation drift distance between time halves
# ---------------------------------------------------------------------------


@register(
    "drift_tv_distance",
    """
    WITH b AS (
      SELECT event_type,
             CASE WHEN epoch_us(ts) <= (SELECT (MIN(epoch_us(ts))
                    + MAX(epoch_us(ts))) // 2 FROM events)
                  THEN 'h1' ELSE 'h2' END AS half
      FROM events
    ), cnt AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN half = 'h1' THEN 1 ELSE 0 END) AS BIGINT)
               AS na,
             CAST(SUM(CASE WHEN half = 'h2' THEN 1 ELSE 0 END) AS BIGINT)
               AS nb
      FROM b GROUP BY event_type
    ), tot AS (
      SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb
      FROM cnt
    )
    SELECT tot.ta AS n_first_half, tot.tb AS n_second_half,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST((1000000 * SUM(abs(cnt.na * tot.tb - cnt.nb * tot.ta)))
                // (2 * tot.ta * tot.tb) AS BIGINT) AS tv_ppm
    FROM cnt, tot
    GROUP BY tot.ta, tot.tb
    """,
    "Total-variation drift distance between the corpus' first and "
    "second time halves' event-type distributions — the "
    "distribution-shift number behind every training/serving skew "
    "monitor, computed without a single float probability: TV = "
    "(1/2) sum |p_i - q_i| becomes sum |na_i*Tb - nb_i*Ta| over "
    "2*Ta*Tb in exact integers (cross-multiplied proportions — the "
    "same trick the ER and kappa entries use). The midpoint split is "
    "derived from the data's own time span (scale-free); TV's "
    "[0, 1e6] range reads directly as 'what fraction of mass would "
    "have to move'. Complements drift_snapshot_stats (level drift) "
    "with DISTRIBUTION drift.",
)
def drift_tv_distance(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.expr("ts div 1000").alias("us")
    )
    mid = ev.agg(
        F.expr("CAST((MIN(us) + MAX(us)) div 2 AS BIGINT)").alias("mid")
    )
    b = ev.crossJoin(F.broadcast(mid)).select(
        "event_type",
        F.when(F.col("us") <= F.col("mid"), "h1").otherwise("h2").alias(
            "half"
        ),
    )
    cnt = b.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == "h1", 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("half") == "h2", 1).otherwise(0))
        .cast("long")
        .alias("nb"),
    )
    tot = cnt.agg(
        F.sum("na").cast("long").alias("ta"),
        F.sum("nb").cast("long").alias("tb"),
    )
    return (
        cnt.crossJoin(F.broadcast(tot))
        .agg(
            F.max("ta").cast("long").alias("n_first_half"),
            F.max("tb").cast("long").alias("n_second_half"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.expr(
                "CAST((1000000 * SUM(abs(na * tb - nb * ta))) "
                "div (2 * MAX(ta) * MAX(tb)) AS BIGINT)"
            ).alias("tv_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Sorted-neighborhood ER blocking vs hash blocking
# ---------------------------------------------------------------------------

_SN_WINDOW = 5


@register(
    "er_sorted_neighborhood",
    f"""
    WITH c AS (
      SELECT c_custkey AS k, c_nationkey AS n, c_mktsegment AS seg,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal
      FROM customer
    ), ranked AS (
      SELECT k, n, seg, bal,
             ROW_NUMBER() OVER (ORDER BY bal, k) AS rk
      FROM c
    ), cand AS (
      SELECT a.k AS a_key, b.k AS b_key,
             a.n = b.n AS same_block,
             CASE WHEN a.seg = b.seg THEN {_ER_W_SEG}
                  ELSE -{_ER_U_SEG} END
             + CASE WHEN (a.bal + {_ER_SHIFT_C}) // {_ER_BAND_C}
                       = (b.bal + {_ER_SHIFT_C}) // {_ER_BAND_C}
                    THEN {_ER_W_BAND} ELSE -{_ER_U_BAND} END
             + CASE WHEN abs(a.bal - b.bal) <= {_ER_CLOSE_C}
                    THEN {_ER_W_CLOSE} ELSE -{_ER_U_CLOSE} END AS score
      FROM ranked a JOIN ranked b
        ON b.rk > a.rk AND b.rk <= a.rk + {_SN_WINDOW - 1}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN score >= {_ER_THRESHOLD}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_matches,
           CAST(SUM(CASE WHEN score >= {_ER_THRESHOLD} AND same_block
                    THEN 1 ELSE 0 END) AS BIGINT)
             AS n_matches_also_in_hash_block
    FROM cand
    """,
    "Sorted-neighborhood ER blocking (Hernandez & Stolfo 1995) — the "
    "OTHER classic blocking strategy, run against the same "
    "Fellegi-Sunter scorer as er_blocked_match_score: records sort by "
    "balance and only rank-window-of-5 neighbors become candidates "
    "(candidate count is linear in n by construction — the guarantee "
    "hash blocking cannot give when a block is skewed), then the "
    "summary counts how many matches the window recovers and how "
    "many of those the nation-hash blocking would ALSO have seen — "
    "the blocking-strategy comparison every ER deployment runs "
    "before choosing. The rank-band join is a theta join on "
    "consecutive ranks (window-shaped, never quadratic); at 100 TB "
    "the sort is a repartitionByRange and the band join is "
    "within-partition with boundary ghosts.",
)
def er_sorted_neighborhood(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import cents

    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_nationkey").alias("n"),
        F.col("c_mktsegment").alias("seg"),
        cents("c_acctbal").alias("bal"),
    )
    ranked = c.withColumn(
        "rk", F.row_number().over(W.orderBy("bal", "k"))
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    band = lambda side: F.expr(  # noqa: E731
        f"({side}.bal + {_ER_SHIFT_C}) div {_ER_BAND_C}"
    )
    cand = a.join(
        b,
        (F.col("b.rk") > F.col("a.rk"))
        & (F.col("b.rk") <= F.col("a.rk") + _SN_WINDOW - 1),
    ).select(
        (F.col("a.n") == F.col("b.n")).alias("same_block"),
        (
            F.when(F.col("a.seg") == F.col("b.seg"), _ER_W_SEG).otherwise(
                -_ER_U_SEG
            )
            + F.when(band("a") == band("b"), _ER_W_BAND).otherwise(
                -_ER_U_BAND
            )
            + F.when(
                F.abs(F.col("a.bal") - F.col("b.bal")) <= _ER_CLOSE_C,
                _ER_W_CLOSE,
            ).otherwise(-_ER_U_CLOSE)
        ).alias("score"),
    )
    return cand.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum(F.when(F.col("score") >= _ER_THRESHOLD, 1).otherwise(0))
        .cast("long")
        .alias("n_matches"),
        F.sum(
            F.when(
                (F.col("score") >= _ER_THRESHOLD) & F.col("same_block"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_matches_also_in_hash_block"),
    )


# ---------------------------------------------------------------------------
# Dorfman pooled screening efficiency audit
# ---------------------------------------------------------------------------

_POOL_SIZE = 8


@register(
    "pooled_screening_dorfman",
    f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN len({_TOKS_SQL}) < {_ABL_MIN_TOK}
                  THEN 1 ELSE 0 END AS positive,
             {_H32_DUCK.format(s="CAST(doc_id AS VARCHAR)")}
               % ((SELECT COUNT(*) FROM documents) // {_POOL_SIZE})
               AS pool
      FROM documents
    ), pools AS (
      SELECT pool, CAST(COUNT(*) AS BIGINT) AS n_members,
             CAST(MAX(positive) AS BIGINT) AS pool_positive
      FROM d GROUP BY pool
    )
    SELECT CAST(SUM(n_members) AS BIGINT) AS n_items,
           CAST(COUNT(*) AS BIGINT) AS n_pools,
           CAST(SUM(pool_positive) AS BIGINT) AS n_positive_pools,
           CAST(COUNT(*) + SUM(pool_positive * n_members) AS BIGINT)
             AS tests_pooled,
           CAST(SUM(n_members) AS BIGINT) AS tests_individual,
           CAST((1000000 * (COUNT(*) + SUM(pool_positive * n_members)))
                // SUM(n_members) AS BIGINT) AS cost_ratio_ppm
    FROM pools
    """,
    "Dorfman pooled screening (1943 — the group-testing scheme "
    "behind every batched expensive-check pipeline, from blood tests "
    "to LLM-judge batch calls): documents hash into pools of ~8, a "
    "pool 'tests positive' if ANY member fails the length screen, "
    "and only positive pools pay for member-by-member retesting — "
    "tests = pools + positives*size against one-test-per-item, with "
    "the cost ratio in ppm (below 1e6 = pooling pays; it flips past "
    "~30% prevalence, which is exactly the call this audit decides). "
    "One hash-pool aggregate; the MAX(positive) OR-fold is the "
    "pooled test. Deterministic pools (hash, not round-robin) so "
    "both engines replay identically.",
)
def pooled_screening_dorfman(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    n_docs = docs.count()  # dimension scalar for the pool modulus
    n_pools = max(1, n_docs // _POOL_SIZE)
    d = docs.select(
        "doc_id",
        F.when(F.size(_toks_a()) < _ABL_MIN_TOK, 1)
        .otherwise(0)
        .alias("positive"),
        (
            F.expr(_H32_SPARK.format(s="cast(doc_id as string)")) % n_pools
        ).alias("pool"),
    )
    pools = d.groupBy("pool").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.max("positive").cast("long").alias("pool_positive"),
    )
    return pools.agg(
        F.sum("n_members").cast("long").alias("n_items"),
        F.count(F.lit(1)).cast("long").alias("n_pools"),
        F.sum("pool_positive").cast("long").alias("n_positive_pools"),
        (
            F.count(F.lit(1))
            + F.sum(F.col("pool_positive") * F.col("n_members"))
        )
        .cast("long")
        .alias("tests_pooled"),
        F.sum("n_members").cast("long").alias("tests_individual"),
        F.expr(
            "CAST((1000000 * (COUNT(*) + SUM(pool_positive * n_members)))"
            " div SUM(n_members) AS BIGINT)"
        ).alias("cost_ratio_ppm"),
    )


# ---------------------------------------------------------------------------
# Static working-set cache hit-rate curve
# ---------------------------------------------------------------------------

_CACHE_SIZES = (8, 16, 32)
_CACHE_VALUES = ", ".join(f"({s})" for s in _CACHE_SIZES)


@register(
    "cache_static_hitrate_curve",
    f"""
    WITH acc AS (
      SELECT json_extract(props, '$.k') AS key FROM events
      WHERE json_extract(props, '$.k') IS NOT NULL
    ), freq AS (
      SELECT key, CAST(COUNT(*) AS BIGINT) AS c,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, key) AS rk
      FROM acc GROUP BY key
    ), tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM freq),
    sz(cache_size) AS (VALUES {_CACHE_VALUES})
    SELECT CAST(sz.cache_size AS BIGINT) AS cache_size,
           CAST(SUM(CASE WHEN f.rk <= sz.cache_size THEN f.c ELSE 0 END)
                AS BIGINT) AS n_hits,
           tot.n AS n_accesses,
           CAST((1000000 * SUM(CASE WHEN f.rk <= sz.cache_size
                               THEN f.c ELSE 0 END)) // tot.n AS BIGINT)
             AS hit_ppm
    FROM freq f CROSS JOIN sz, tot
    GROUP BY sz.cache_size, tot.n
    """,
    "Static working-set cache curve: for cache sizes 8/16/32, the "
    "share of event accesses (by the props.k key) that hit a cache "
    "holding the top-k most frequent keys — the UPPER BOUND any "
    "static cache policy can reach, and the first number a cache-"
    "sizing decision reads (a dynamic LRU simulation is a sequential "
    "fold; the static bound is one aggregate and usually answers the "
    "question). Frequency ties break by key so the curve is a pure "
    "function of the data; the 3-row size spine collapses map-side. "
    "Reads the key from the JSON props column (the f_json family's "
    "extraction path) — a real access log's cache key is always "
    "buried in a payload.",
)
def cache_static_hitrate_curve(spark, sf_dir):
    acc = (
        t(spark, sf_dir, "events")
        .select(F.get_json_object("props", "$.k").alias("key"))
        .where(F.col("key").isNotNull())
    )
    freq = (
        acc.groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn(
            "rk", F.row_number().over(W.orderBy(F.desc("c"), F.asc("key")))
        )
    )
    tot = freq.agg(F.sum("c").cast("long").alias("n"))
    sz = spark.createDataFrame(
        [(s,) for s in _CACHE_SIZES], "cache_size long"
    )
    return (
        freq.crossJoin(F.broadcast(sz))
        .crossJoin(F.broadcast(tot))
        .groupBy("cache_size", "n")
        .agg(
            F.sum(
                F.when(F.col("rk") <= F.col("cache_size"), F.col("c"))
                .otherwise(0)
            )
            .cast("long")
            .alias("n_hits"),
        )
        .select(
            "cache_size",
            "n_hits",
            F.col("n").alias("n_accesses"),
            F.expr("CAST((1000000 * n_hits) div n AS BIGINT)").alias(
                "hit_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Optimal-stopping (secretary rule) audit
# ---------------------------------------------------------------------------

_OS_CAP = 12
_OS_CUTOFF = 4  # ~ n/e for n = 12


@register(
    "optimal_stopping_audit",
    f"""
    WITH w AS (
      SELECT user_id,
             CAST(ROUND(value * 100) AS BIGINT) AS v,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_ns(ts), event_id) AS rn
      FROM events
    ), cap AS (
      SELECT user_id, v, rn FROM w WHERE rn <= {_OS_CAP}
    ), stats AS (
      SELECT user_id, v, rn,
             MAX(v) OVER (PARTITION BY user_id
                          ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS best_before,
             MAX(v) OVER (PARTITION BY user_id) AS true_best,
             MAX(CASE WHEN rn <= {_OS_CUTOFF} THEN v END)
               OVER (PARTITION BY user_id) AS sample_best,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM cap
    ), picks AS (
      SELECT user_id, v AS picked, true_best, n,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS prn
      FROM stats
      WHERE rn > {_OS_CUTOFF} AND v > COALESCE(sample_best, -1)
        AND (best_before IS NULL OR v > best_before)
    ), chosen AS (
      SELECT s.user_id, MAX(s.n) AS n, MAX(s.true_best) AS true_best,
             MAX(p.picked) AS picked
      FROM stats s LEFT JOIN picks p
        ON p.user_id = s.user_id AND p.prn = 1
      GROUP BY s.user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_candidates,
           CAST(COALESCE(picked,
                (SELECT MAX(c2.v) FROM cap c2
                 WHERE c2.user_id = chosen.user_id
                   AND c2.rn = chosen.n)) AS BIGINT) AS picked_c,
           CAST(true_best AS BIGINT) AS best_c,
           CAST(CASE WHEN COALESCE(picked,
                (SELECT MAX(c2.v) FROM cap c2
                 WHERE c2.user_id = chosen.user_id
                   AND c2.rn = chosen.n)) = true_best
                THEN 1 ELSE 0 END AS BIGINT) AS got_best
    FROM chosen
    """,
    "Optimal stopping (the secretary 1/e rule) audited per user: "
    "observe the first 4 of up to 12 time-ordered values without "
    "committing, then take the FIRST later value beating everything "
    "seen so far; if none ever does, the last candidate is forced — "
    "the irrevocable-choice discipline behind early-stopping "
    "hyperparameter triage and streaming best-candidate selection, "
    "replayed deterministically (no RNG: the event order IS the "
    "arrival order). Everything is running-max windows: best-before "
    "prefix max, sample-phase max, first qualifying pick by rank — "
    "no fold, no driver loop. got_best against the true max reads "
    "off the rule's empirical success rate (~37% is the theoretical "
    "optimum under random arrivals).",
)
def optimal_stopping_audit(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import cents

    w = t(spark, sf_dir, "events").select(
        "user_id",
        cents("value").alias("v"),
        F.row_number()
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    cap = w.where(F.col("rn") <= _OS_CAP)
    wp = W.partitionBy("user_id")
    wo = W.partitionBy("user_id").orderBy("rn")
    stats = cap.select(
        "user_id",
        "v",
        "rn",
        F.max("v").over(wo.rowsBetween(W.unboundedPreceding, -1)).alias(
            "best_before"
        ),
        F.max("v").over(wp).alias("true_best"),
        F.max(F.when(F.col("rn") <= _OS_CUTOFF, F.col("v"))).over(wp).alias(
            "sample_best"
        ),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    picks = (
        stats.where(
            (F.col("rn") > _OS_CUTOFF)
            & (F.col("v") > F.coalesce("sample_best", F.lit(-1)))
            & (
                F.col("best_before").isNull()
                | (F.col("v") > F.col("best_before"))
            )
        )
        .withColumn("prn", F.row_number().over(wo))
        .where(F.col("prn") == 1)
        .select(
            F.col("user_id").alias("pu"), F.col("v").alias("picked")
        )
    )
    last = cap.withColumn(
        "lrn", F.row_number().over(W.partitionBy("user_id").orderBy(F.desc("rn")))
    ).where(F.col("lrn") == 1).select(
        F.col("user_id").alias("lu"), F.col("v").alias("last_v")
    )
    per_user = stats.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_candidates"),
        F.max("true_best").cast("long").alias("best_c"),
    )
    return (
        per_user.join(picks, per_user["user_id"] == picks["pu"], "left")
        .join(last, per_user["user_id"] == last["lu"])
        .select(
            "user_id",
            "n_candidates",
            F.coalesce("picked", "last_v").cast("long").alias("picked_c"),
            "best_c",
            F.when(
                F.coalesce("picked", "last_v") == F.col("best_c"), 1
            )
            .otherwise(0)
            .cast("long")
            .alias("got_best"),
        )
    )


# ---------------------------------------------------------------------------
# Simpson's paradox audit: pooled vs per-group trend signs
# ---------------------------------------------------------------------------


@register(
    "simpson_paradox_audit",
    """
    WITH d AS (
      SELECT event_type AS grp,
             epoch_us(ts) // 86400000000
               - (SELECT MIN(epoch_us(ts) // 86400000000) FROM events)
               AS x,
             CAST(ROUND(value * 100) AS BIGINT) AS y
      FROM events
    ), per_group AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT)
               AS cov_num
      FROM d GROUP BY grp
    ), pooled AS (
      SELECT CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT)
               AS cov_num
      FROM d
    )
    SELECT g.grp, g.n,
           CAST(CASE WHEN g.cov_num > 0 THEN 1
                     WHEN g.cov_num < 0 THEN -1 ELSE 0 END AS BIGINT)
             AS group_trend_sign,
           CAST(CASE WHEN p.cov_num > 0 THEN 1
                     WHEN p.cov_num < 0 THEN -1 ELSE 0 END AS BIGINT)
             AS pooled_trend_sign,
           CAST(CASE WHEN (g.cov_num > 0) <> (p.cov_num > 0)
                      AND g.cov_num <> 0 AND p.cov_num <> 0
                THEN 1 ELSE 0 END AS BIGINT) AS sign_reversed
    FROM per_group g, pooled p
    """,
    "Simpson's-paradox audit: the SIGN of the value-over-day trend "
    "per event type against the pooled sign, via exact integer "
    "covariance numerators (n*sum(xy) - sum(x)*sum(y) — day indices "
    "are span-relative so the products stay far inside int64, and "
    "sign comparison needs no division at all). A reversal row "
    "(group trend up while pooled is down, or vice versa) is the "
    "aggregation trap every cohort metric review must check before "
    "reading a pooled trend — the diagnosis is dimension-sized: one "
    "moment aggregate per group + one pooled, signs joined.",
)
def simpson_paradox_audit(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import cents

    base = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.expr("(ts div 1000) div 86400000000").alias("day"),
        cents("value").alias("y"),
    )
    d0 = base.agg(F.min("day").alias("d0"))
    d = base.crossJoin(F.broadcast(d0)).select(
        "grp", (F.col("day") - F.col("d0")).alias("x"), "y"
    )
    per_group = d.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.count(F.lit(1)) * F.sum(F.col("x") * F.col("y"))
            - F.sum("x") * F.sum("y")
        )
        .cast("long")
        .alias("cov_num"),
    )
    pooled = d.agg(
        (
            F.count(F.lit(1)) * F.sum(F.col("x") * F.col("y"))
            - F.sum("x") * F.sum("y")
        )
        .cast("long")
        .alias("p_cov")
    )
    sign = lambda c: (  # noqa: E731
        F.when(F.col(c) > 0, 1).when(F.col(c) < 0, -1).otherwise(0)
    )
    return (
        per_group.crossJoin(F.broadcast(pooled))
        .select(
            "grp",
            "n",
            sign("cov_num").cast("long").alias("group_trend_sign"),
            sign("p_cov").cast("long").alias("pooled_trend_sign"),
            F.when(
                ((F.col("cov_num") > 0) != (F.col("p_cov") > 0))
                & (F.col("cov_num") != 0)
                & (F.col("p_cov") != 0),
                1,
            )
            .otherwise(0)
            .cast("long")
            .alias("sign_reversed"),
        )
    )


# ---------------------------------------------------------------------------
# Recency-decayed value sums via integer halving
# ---------------------------------------------------------------------------

_DECAY_HALFLIFE_DAYS = 7


@register(
    "decayed_value_sum",
    f"""
    WITH d AS (
      SELECT user_id,
             CAST(ROUND(value * 100) AS BIGINT) AS c,
             ((SELECT MAX(epoch_us(ts) // 86400000000) FROM events)
              - epoch_us(ts) // 86400000000) AS age_days
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(c) AS BIGINT) AS raw_sum_c,
           CAST(SUM(c >> CAST(LEAST(age_days // {_DECAY_HALFLIFE_DAYS}, 62)
                              AS INT)) AS BIGINT) AS decayed_sum_c
    FROM d GROUP BY user_id
    """,
    "Recency-decayed engagement sums with INTEGER half-life decay: "
    "each cent value is right-shifted once per elapsed 7-day "
    "half-life (v >> (age/7) IS v * 2^-k — the exponential-decay "
    "weighting of every recency-biased engagement score, with the "
    "float pow() replaced by a bit shift both engines evaluate "
    "identically; shift clamped at 62 so ancient events contribute "
    "0, never wrap). Age anchors to the corpus max day (pure "
    "function of the data). The algebraic-aggregate counterpart to "
    "ewma_user_value's order-dependent fold: this decay DOES "
    "distribute, so it needs no Arrow kernel — one hash aggregate, "
    "map-side combine, done; choosing between the two forms is "
    "exactly the distributivity question the engine's fold doctrine "
    "documents.",
)
def decayed_value_sum(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import cents

    base = t(spark, sf_dir, "events").select(
        "user_id",
        cents("value").alias("c"),
        F.expr("(ts div 1000) div 86400000000").alias("day"),
    )
    mx = base.agg(F.max("day").alias("mx"))
    d = base.crossJoin(F.broadcast(mx)).select(
        "user_id",
        "c",
        (F.col("mx") - F.col("day")).alias("age_days"),
    )
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("c").cast("long").alias("raw_sum_c"),
        F.sum(
            F.expr(
                f"shiftright(c, CAST(LEAST(age_days div "
                f"{_DECAY_HALFLIFE_DAYS}, 62) AS INT))"
            )
        )
        .cast("long")
        .alias("decayed_sum_c"),
    )


# ---------------------------------------------------------------------------
# Inter-arrival time percentiles per event type
# ---------------------------------------------------------------------------


@register(
    "interarrival_percentiles",
    """
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY event_type ORDER BY epoch_us(ts), event_id
             ) AS gap_us
      FROM events
    ), g AS (
      SELECT event_type, gap_us,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY gap_us, gap_us) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM gaps WHERE gap_us IS NOT NULL
    )
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_gaps,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN gap_us END)
                AS BIGINT) AS p50_us,
           CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN gap_us END)
                AS BIGINT) AS p90_us,
           CAST(MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN gap_us END)
                AS BIGINT) AS p99_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_us
    FROM g GROUP BY event_type
    """,
    "Inter-arrival time percentiles per event type (exact order "
    "statistics at ceil-rank positions — the p50/p90/p99/max every "
    "capacity plan and timeout budget reads off an arrival process): "
    "one LAG window per type over the time-ordered stream, then one "
    "rank window over the GAP table. The arrival-process companion "
    "to sessionize (which thresholds these gaps) and "
    "late_event_audit (which delays them); reading all three is how "
    "a streaming deployment picks its session gap and watermark in "
    "one sitting.",
)
def interarrival_percentiles(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.expr("ts div 1000").alias("us"), "event_id"
    )
    wt = W.partitionBy("event_type").orderBy("us", "event_id")
    gaps = ev.select(
        "event_type",
        (F.col("us") - F.lag("us").over(wt)).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    wr = W.partitionBy("event_type").orderBy("gap_us")
    g = gaps.select(
        "event_type",
        "gap_us",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("n"),
    )
    return g.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_gaps"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("gap_us"))
        )
        .cast("long")
        .alias("p50_us"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("gap_us")
            )
        )
        .cast("long")
        .alias("p90_us"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(99 * n + 99) div 100"),
                F.col("gap_us"),
            )
        )
        .cast("long")
        .alias("p99_us"),
        F.max("gap_us").cast("long").alias("max_us"),
    )


# ---------------------------------------------------------------------------
# Leave-one-cohort-out metric sensitivity (jackknife influence)
# ---------------------------------------------------------------------------

_JK_COHORTS = 10


@register(
    "metric_jackknife_cohorts",
    f"""
    WITH d AS (
      SELECT user_id % {_JK_COHORTS} AS cohort,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events
    ), per AS (
      SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s
      FROM d GROUP BY cohort
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(s) AS BIGINT) AS ts
      FROM per
    )
    SELECT per.cohort, per.n AS cohort_events,
           CAST((100 * tot.ts) // tot.tn AS BIGINT) AS overall_mean_c,
           CAST((100 * (tot.ts - per.s)) // (tot.tn - per.n) AS BIGINT)
             AS loo_mean_c,
           CAST((100 * (tot.ts - per.s)) // (tot.tn - per.n)
                - (100 * tot.ts) // tot.tn AS BIGINT) AS influence_c
    FROM per, tot
    """,
    "Leave-one-cohort-out sensitivity of the mean event value — the "
    "jackknife influence read that tells you whether a headline "
    "metric is carried by one user cohort (drop each of the 10 "
    "user-mod cohorts, recompute the mean from the COMPLEMENT totals "
    "— no second scan, pure subtraction on the per-cohort "
    "aggregates): a large |influence| row is the cohort whose outage "
    "or exclusion would move the metric, the robustness check run "
    "before anyone ships a topline number. Mean reported in "
    "hundredth-cents ((100*sum) div n) so the integer division "
    "keeps two digits past the cent, identical in both engines.",
)
def metric_jackknife_cohorts(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.catalog import cents

    d = t(spark, sf_dir, "events").select(
        (F.col("user_id") % _JK_COHORTS).alias("cohort"),
        cents("value").alias("c"),
    )
    per = d.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("s").cast("long").alias("ts"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "cohort",
        F.col("n").alias("cohort_events"),
        F.expr("CAST((100 * ts) div tn AS BIGINT)").alias("overall_mean_c"),
        F.expr(
            "CAST((100 * (ts - s)) div (tn - n) AS BIGINT)"
        ).alias("loo_mean_c"),
        F.expr(
            "CAST((100 * (ts - s)) div (tn - n) - (100 * ts) div tn "
            "AS BIGINT)"
        ).alias("influence_c"),
    )


# ---------------------------------------------------------------------------
# Funnel time-to-convert percentiles
# ---------------------------------------------------------------------------


@register(
    "funnel_time_to_convert",
    """
    WITH fv AS (
      SELECT user_id, MIN(epoch_us(ts)) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), fp AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS first_purchase
      FROM events e JOIN fv ON fv.user_id = e.user_id
      WHERE e.event_type = 'purchase'
        AND epoch_us(e.ts) > fv.first_view
      GROUP BY e.user_id
    ), dur AS (
      SELECT fp.user_id,
             fp.first_purchase - fv.first_view AS d_us,
             ROW_NUMBER() OVER (ORDER BY fp.first_purchase - fv.first_view,
                                fp.user_id) AS rn,
             COUNT(*) OVER () AS n
      FROM fp JOIN fv ON fv.user_id = fp.user_id
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
           CAST((SELECT COUNT(*) FROM fv) AS BIGINT) AS n_entered,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN d_us END) AS BIGINT)
             AS p50_us,
           CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN d_us END)
                AS BIGINT) AS p90_us,
           CAST(MAX(d_us) AS BIGINT) AS max_us
    FROM dur
    """,
    "Funnel time-to-convert: for every user whose first purchase "
    "STRICTLY FOLLOWS their first view, the conversion latency's "
    "exact p50/p90/max (ceil-rank order statistics) next to the "
    "entered/converted counts — the DURATION companion to "
    "funnel_view_click_purchase's conversion counts, and the number "
    "a re-marketing window is actually set from. Strict ordering "
    "(purchase after view, not merely same user) is the semantics "
    "attribution requires; two per-user MIN aggregates + one global "
    "rank over the CONVERTED-user table (converted users, not "
    "events, bound the window).",
)
def funnel_time_to_convert(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts div 1000").alias("us")
    )
    fv = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("first_view"))
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .where(F.col("us") > F.col("first_view"))
        .groupBy("user_id", "first_view")
        .agg(F.min("us").alias("first_purchase"))
    )
    dur = fp.select(
        "user_id",
        (F.col("first_purchase") - F.col("first_view")).alias("d_us"),
    )
    wr = W.orderBy("d_us", "user_id")
    ranked = dur.select(
        "d_us",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    entered = fv.agg(F.count(F.lit(1)).cast("long").alias("n_entered"))
    return (
        ranked.agg(
            F.max("n").cast("long").alias("n_converted"),
            F.max(
                F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("d_us"))
            )
            .cast("long")
            .alias("p50_us"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("d_us")
                )
            )
            .cast("long")
            .alias("p90_us"),
            F.max("d_us").cast("long").alias("max_us"),
        )
        .crossJoin(F.broadcast(entered))
        .select("n_converted", "n_entered", "p50_us", "p90_us", "max_us")
    )


# ---------------------------------------------------------------------------
# Luhn checksum validation audit
# ---------------------------------------------------------------------------


def _luhn_sql(base: str, engine: str) -> tuple[str, str]:
    """(check_digit_expr, id_expr) for a 7-digit base number: Luhn
    doubles every second digit from the right (positions 1,3,5,7 of the
    7-digit base when the check digit sits at position 0), caps with
    digit-sum (2d -> 2d - 9 when 2d > 9). Pure integer column math,
    identical strings valid in Spark SQL and DuckDB."""
    div = "div" if engine == "spark" else "//"
    digs = [f"(({base}) {div} {10 ** i}) % 10" for i in range(7)]
    # from the right of the FULL id (check digit at 10^0), base digit i
    # sits at position i+1 -> doubled when (i+1) is odd -> i even
    terms = []
    for i, d in enumerate(digs):
        if i % 2 == 0:
            terms.append(f"(CASE WHEN 2 * ({d}) > 9 THEN 2 * ({d}) - 9 "
                         f"ELSE 2 * ({d}) END)")
        else:
            terms.append(f"({d})")
    s = " + ".join(terms)
    check = f"((10 - (({s}) % 10)) % 10)"
    full_id = f"(({base}) * 10 + {check})"
    return check, full_id


@register(
    "dq_luhn_checksum",
    f"""
    WITH base AS (
      SELECT event_id, (event_id * 7919 + 12345) % 10000000 AS b,
             event_id % 97 = 0 AS corrupted
      FROM events
    ), ids AS (
      SELECT event_id, corrupted,
             CASE WHEN corrupted
                  THEN ({_luhn_sql('b', 'duck')[1]} + 1) % 100000000
                  ELSE {_luhn_sql('b', 'duck')[1]} END AS card_id
      FROM base
    ), checked AS (
      SELECT event_id, corrupted, card_id,
             {_luhn_sql('card_id // 10', 'duck')[0]}
               = card_id % 10 AS luhn_valid
      FROM ids
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_ids,
           CAST(SUM(CASE WHEN corrupted THEN 1 ELSE 0 END) AS BIGINT)
             AS n_corrupted,
           CAST(SUM(CASE WHEN luhn_valid THEN 1 ELSE 0 END) AS BIGINT)
             AS n_valid,
           CAST(SUM(CASE WHEN corrupted AND luhn_valid
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_missed
    FROM checked
    """,
    "Luhn checksum validation audit (ISO/IEC 7812 — the mod-10 "
    "check behind card numbers, IMEIs and national ids): synthetic "
    "8-digit identifiers carry a genuine Luhn check digit, a "
    "deterministic 1-in-97 subset is corrupted by a single-digit "
    "increment, and the audit counts how many corruptions the "
    "checksum catches — by construction a +1 on the check digit "
    "ALWAYS fails validation, so n_missed = 0 (pinned by test; "
    "single-digit errors are exactly what Luhn guarantees to "
    "detect). The double-and-cap digit arithmetic is generated once "
    "and emitted for BOTH engines — pure integer column math, no "
    "UDF, one scan. The id-integrity companion to "
    "dq_sequence_audit's completeness check.",
)
def dq_luhn_checksum(spark, sf_dir):
    check_b, full_b = _luhn_sql("b", "spark")
    check_v, _ = _luhn_sql("card_id div 10", "spark")
    base = t(spark, sf_dir, "events").select(
        "event_id",
        F.expr("(event_id * 7919 + 12345) % 10000000").alias("b"),
        (F.col("event_id") % 97 == 0).alias("corrupted"),
    )
    ids = base.select(
        "event_id",
        "corrupted",
        F.expr(
            f"CASE WHEN corrupted THEN ({full_b} + 1) % 100000000 "
            f"ELSE {full_b} END"
        ).alias("card_id"),
    )
    checked = ids.select(
        "corrupted",
        F.expr(f"{check_v} = card_id % 10").alias("luhn_valid"),
    )
    return checked.agg(
        F.count(F.lit(1)).cast("long").alias("n_ids"),
        F.sum(F.when(F.col("corrupted"), 1).otherwise(0))
        .cast("long")
        .alias("n_corrupted"),
        F.sum(F.when(F.col("luhn_valid"), 1).otherwise(0))
        .cast("long")
        .alias("n_valid"),
        F.sum(
            F.when(F.col("corrupted") & F.col("luhn_valid"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_missed"),
    )


# ---------------------------------------------------------------------------
# Session max-concurrency via sweep line
# ---------------------------------------------------------------------------

_SC_GAP_US = 1800000000  # 30-minute session gap


@register(
    "session_max_concurrency",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                       > {_SC_GAP_US}
                   OR LAG(epoch_us(ts)) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events WINDOW w AS (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id)
    ), sess AS (
      SELECT user_id, MIN(us) AS s_start, MAX(us) AS s_end
      FROM (
        SELECT user_id, us,
               SUM(is_start) OVER (PARTITION BY user_id
                                   ORDER BY us
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM e
      ) GROUP BY user_id, sid
    ), bounds AS (
      -- end is EXCLUSIVE at s_end + 1us: a session ending exactly when
      -- another starts does not overlap it (deterministic tie rule:
      -- -1 deltas sort before +1 at the same instant)
      SELECT s_start AS at_us, 1 AS delta FROM sess
      UNION ALL
      SELECT s_end + 1, -1 FROM sess
    ), sweep AS (
      SELECT at_us,
             SUM(delta) OVER (ORDER BY at_us, delta
                              ROWS UNBOUNDED PRECEDING) AS live
      FROM bounds
    )
    SELECT CAST((SELECT COUNT(*) FROM sess) AS BIGINT) AS n_sessions,
           CAST(MAX(live) AS BIGINT) AS max_concurrent,
           CAST((SELECT COUNT(DISTINCT user_id) FROM sess) AS BIGINT)
             AS n_users
    FROM sweep
    """,
    "Peak session concurrency via the classic sweep line: sessions "
    "come from the 30-minute-gap rule (the sessionize semantics), "
    "each contributes +1 at its start and -1 just past its end "
    "(exclusive end with a deterministic -1-before-+1 tie order, so "
    "back-to-back sessions never double-count), and the running sum's "
    "maximum IS the peak simultaneous load — the number capacity "
    "planning and license sizing actually need, which no windowed "
    "count approximates exactly (a session spans many windows). One "
    "keyed session build + one global boundary sort of 2 rows per "
    "SESSION (not per event) — the sweep input is session-bounded at "
    "any event volume.",
)
def session_max_concurrency(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000").alias("us"), "event_id"
    )
    wu = W.partitionBy("user_id").orderBy("us", "event_id")
    e = ev.withColumn(
        "is_start",
        F.when(
            (F.col("us") - F.lag("us").over(wu) > _SC_GAP_US)
            | F.lag("us").over(wu).isNull(),
            1,
        ).otherwise(0),
    )
    sess = (
        e.withColumn(
            "sid",
            F.sum("is_start").over(
                W.partitionBy("user_id")
                .orderBy("us")
                .rowsBetween(W.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("us").alias("s_start"), F.max("us").alias("s_end"))
    )
    bounds = sess.select(
        F.col("s_start").alias("at_us"), F.lit(1).alias("delta")
    ).unionAll(
        sess.select((F.col("s_end") + 1).alias("at_us"), F.lit(-1))
    )
    ws = W.orderBy("at_us", "delta").rowsBetween(W.unboundedPreceding, 0)
    sweep = bounds.select(F.sum("delta").over(ws).alias("live"))
    n_sessions = sess.agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    n_users = sess.agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    return (
        sweep.agg(F.max("live").cast("long").alias("max_concurrent"))
        .crossJoin(F.broadcast(n_sessions))
        .crossJoin(F.broadcast(n_users))
        .select("n_sessions", "max_concurrent", "n_users")
    )


# ---------------------------------------------------------------------------
# Deterministic integer Lloyd's k-means (fixed rounds, exact oracle)
# ---------------------------------------------------------------------------

_KM_K = 8        # clusters (seeded from the first K vectors by id)
_KM_ROUNDS = 4   # fixed Lloyd iterations (pure function of the data)
_KM_MILLI = 1000 # centroid fixed-point scale (milli-units of qv)


def _lloyd_rounds_sql() -> str:
    """Shared unrolled-Lloyd round fragments (CTE names x / cent{r}),
    all-integer: distances in milli-units squared, centroid updates as
    truncating integer division (Spark `div` == DuckDB `//`, both
    toward zero), empty clusters keep their previous centroid via the
    LEFT JOIN. Used by the kmeans_lloyd_integer oracle (whole table)
    and the sim_ivf_topk oracle (corpus subset) — the source only
    changes what the `x` CTE selects."""
    rounds = []
    for r in range(1, _KM_ROUNDS + 1):
        rounds.append(f"""
    d{r} AS MATERIALIZED (
      SELECT x.vec_id, c.cid,
             SUM((x.xm - c.c) * (x.xm - c.c)) AS d2
      FROM x JOIN cent{r - 1} c ON x.pos = c.pos
      GROUP BY 1, 2
    ),
    a{r} AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cid) AS rn
        FROM d{r}
      ) WHERE rn = 1
    ),
    u{r} AS MATERIALIZED (
      SELECT a.cid, x.pos,
             ({_KM_MILLI} * SUM(x.xu)) // COUNT(*) AS uc
      FROM a{r} a JOIN x ON x.vec_id = a.vec_id
      GROUP BY 1, 2
    ),
    cent{r} AS MATERIALIZED (
      SELECT p.cid, p.pos, COALESCE(u.uc, p.c) AS c
      FROM cent{r - 1} p
      LEFT JOIN u{r} u ON u.cid = p.cid AND u.pos = p.pos
    )""")
    return ",".join(rounds)


def _kmeans_oracle() -> str:
    """Unrolled replay of _KM_ROUNDS Lloyd iterations over the whole
    embeddings table — see _lloyd_rounds_sql for the arithmetic."""
    R = _KM_ROUNDS
    return f"""
    WITH q AS MATERIALIZED (
      SELECT vec_id, {_QV_SQL} AS qv FROM embeddings
    ), x AS MATERIALIZED (
      SELECT vec_id, i AS pos, qv[i] AS xu, qv[i] * {_KM_MILLI} AS xm
      FROM q, range(1, 65) t(i)
    ), seeds AS MATERIALIZED (
      SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT {_KM_K}
    ), cent0 AS MATERIALIZED (
      SELECT vec_id AS cid, i AS pos, qv[i] * {_KM_MILLI} AS c
      FROM seeds, range(1, 65) t(i)
    ),
    {_lloyd_rounds_sql()},
    final_d AS (
      SELECT a.vec_id, a.cid, d.d2
      FROM a{R} a JOIN d{R} d ON d.vec_id = a.vec_id AND d.cid = a.cid
    ), sizes AS (
      SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members,
             CAST(SUM(d2 // 1000000) AS BIGINT) AS inertia_m
      FROM final_d GROUP BY cid
    ), l1 AS (
      SELECT cid, CAST(SUM(ABS(c)) AS BIGINT) AS centroid_l1
      FROM cent{R} GROUP BY cid
    )
    SELECT s.cid, s.n_members, s.inertia_m, l1.centroid_l1
    FROM sizes s JOIN l1 ON l1.cid = s.cid
    """


@register(
    "kmeans_lloyd_integer",
    _kmeans_oracle(),
    "Deterministic distributed Lloyd's k-means under the EXACT gate — "
    "the oracle-backed answer to sim_ivf_topk's documented caveat "
    "(KMeans|| initialization samples per partition, so MLlib cells "
    "shift with physical layout; this build is a pure function of the "
    "data): centers seed from the first 8 vectors by id, 4 FIXED Lloyd "
    "rounds (the pagerank/kcore fixed-budget doctrine, unrolled "
    "MATERIALIZED-CTE replay), ALL-INTEGER arithmetic — squared L2 in "
    "milli-unit fixed point, centroid updates as truncating integer "
    "division (Spark div == DuckDB //), ties to the smaller center id, "
    "empty clusters keep their previous centroid. Output per cluster: "
    "size, truncated-sum inertia, centroid L1 mass. Scale shape per "
    "round: one 512-row broadcast hash join onto the exploded "
    "(vec, dim) frame + two hash aggregates — the exact shape MLlib "
    "KMeans runs, minus the layout-dependent init; lineage cut per "
    "round via localCheckpoint.",
)
def kmeans_lloyd_integer(spark, sf_dir):
    q = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_QV_SPARK).alias("qv")
    )
    x = _lloyd_explode(q).localCheckpoint(eager=False)
    cent, assign, dists = _lloyd_fit(x, _lloyd_seed_cent(q))
    final_d = assign.join(dists, ["vec_id", "cid"])
    sizes = final_d.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum(F.expr("d2 div 1000000")).cast("long").alias("inertia_m"),
    )
    l1 = cent.groupBy("cid").agg(
        F.sum(F.abs(F.col("c"))).cast("long").alias("centroid_l1")
    )
    return sizes.join(l1, "cid").select(
        "cid", "n_members", "inertia_m", "centroid_l1"
    )


def _lloyd_explode(q):
    """(vec_id, qv) -> exploded (vec_id, pos, xu, xm) milli frame."""
    return q.select("vec_id", F.posexplode("qv").alias("pos0", "xu")).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        "xu",
        (F.col("xu") * _KM_MILLI).alias("xm"),
    )


def _lloyd_seed_cent(q):
    """Seed centroids from the first _KM_K vectors by id (milli units)."""
    return (
        q.orderBy("vec_id")
        .limit(_KM_K)
        .select(F.col("vec_id").alias("cid"), "qv")
        .select("cid", F.posexplode("qv").alias("pos0", "cu"))
        .select(
            "cid",
            (F.col("pos0") + 1).alias("pos"),
            (F.col("cu") * _KM_MILLI).alias("c"),
        )
    )


def _lloyd_dists(x, cent):
    """Integer squared-L2 of every vector to every centroid: one
    broadcast hash join onto the exploded frame + one hash aggregate."""
    return (
        x.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "cid")
        .agg(
            F.sum(
                (F.col("xm") - F.col("c")) * (F.col("xm") - F.col("c"))
            ).alias("d2")
        )
    )


def _lloyd_fit(x, cent):
    """_KM_ROUNDS fixed integer Lloyd iterations (the unrolled-CTE
    oracle _lloyd_rounds_sql replays this bit-for-bit). Returns the
    final (cent, assign, dists); lineage cut per round."""
    w = W.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cid"))
    assign = dists = None
    for _ in range(_KM_ROUNDS):
        dists = _lloyd_dists(x, cent)
        assign = (
            dists.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "cid")
        )
        upd = (
            assign.join(x, "vec_id")
            .groupBy("cid", "pos")
            .agg(
                F.expr(
                    f"CAST(({_KM_MILLI} * SUM(xu)) div COUNT(*) AS BIGINT)"
                ).alias("uc")
            )
        )
        cent = (
            cent.join(upd, ["cid", "pos"], "left")
            .select("cid", "pos", F.coalesce("uc", "c").alias("c"))
            .localCheckpoint(eager=False)
        )
    return cent, assign, dists


# ---------------------------------------------------------------------------
# IVF ANN on deterministic integer-Lloyd cells (oracle-backed end-to-end)
# ---------------------------------------------------------------------------

_IVF_PROBE = 3  # cells probed per query
_IVF_K = 3      # neighbors returned per query


def _ivf_lloyd_oracle(n_probe: int = _IVF_PROBE, k: int = _IVF_K) -> str:
    """Full-pipeline replay of sim_ivf_topk: the corpus-side Lloyd fit
    (shared _lloyd_rounds_sql fragments), nearest-cell assignment from
    the final round, integer-L2 query probing against the final
    centroids, candidate union over probed cells, exact cosine re-rank
    — the oracle replays which candidates were pruned, not just the
    final ranking (same doctrine as _ivf_pivot_oracle)."""
    from youtube_trending_data_pipeline_spark.catalog_ext import _COS_SQL

    R = _KM_ROUNDS
    rr = _COS_SQL.format(a="qr.embedding", b="co.embedding")
    return f"""
    WITH q AS MATERIALIZED (
      SELECT vec_id, {_QV_SQL} AS qv, embedding
      FROM embeddings WHERE vec_id >= 5
    ), x AS MATERIALIZED (
      SELECT vec_id, i AS pos, qv[i] AS xu, qv[i] * {_KM_MILLI} AS xm
      FROM q, range(1, 65) t(i)
    ), seeds AS MATERIALIZED (
      SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT {_KM_K}
    ), cent0 AS MATERIALIZED (
      SELECT vec_id AS cid, i AS pos, qv[i] * {_KM_MILLI} AS c
      FROM seeds, range(1, 65) t(i)
    ),
    {_lloyd_rounds_sql()},
    qq AS MATERIALIZED (
      SELECT vec_id AS query_id, {_QV_SQL} AS qv, embedding
      FROM embeddings WHERE vec_id < 5
    ), xq AS MATERIALIZED (
      SELECT query_id, i AS pos, qv[i] * {_KM_MILLI} AS xm
      FROM qq, range(1, 65) t(i)
    ), dq AS MATERIALIZED (
      SELECT xq.query_id, c.cid,
             SUM((xq.xm - c.c) * (xq.xm - c.c)) AS d2
      FROM xq JOIN cent{R} c ON xq.pos = c.pos
      GROUP BY 1, 2
    ), probes AS (
      SELECT query_id, cid AS cell FROM (
        SELECT query_id, cid,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY d2, cid) AS rn
        FROM dq
      ) WHERE rn <= {n_probe}
    ), cand AS (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN a{R} a ON a.cid = p.cell
    )
    SELECT query_id, neighbor_id, cos, rank FROM (
      SELECT cand.query_id, cand.neighbor_id, {rr} AS cos,
             ROW_NUMBER() OVER (PARTITION BY cand.query_id
                                ORDER BY {rr} DESC,
                                         cand.neighbor_id ASC) AS rank
      FROM cand
      JOIN qq qr ON qr.query_id = cand.query_id
      JOIN q co ON co.vec_id = cand.neighbor_id
    ) WHERE rank <= {k}
    """


@register(
    "sim_ivf_topk",
    _ivf_lloyd_oracle(),
    "IVF ANN (learned cells + n_probe search + exact re-rank), "
    "end-to-end in the EXACT gate — round 8 retires the registry's "
    "one rows-only entry: the cell builder is now the deterministic "
    "integer-Lloyd kernel (seeded from the first 8 corpus vectors by "
    "id, 4 fixed all-integer rounds — a pure function of the data, "
    "where MLlib's KMeans|| init samples per partition and shifts "
    "with physical layout). Corpus vectors assign to their final "
    "nearest centroid (integer milli-L2, ties to the smaller cid), "
    "queries probe the 3 nearest cells the same way, and candidates "
    "get an exact cosine re-rank with (cos DESC, id ASC) tie-break. "
    "The unrolled-CTE oracle replays the ENTIRE index pipeline — "
    "including which candidates were pruned. Scale shape: per-round "
    "512-row broadcast joins + hash aggregates (the MLlib KMeans "
    "shape minus the layout-dependent init), cell-bucketed candidate "
    "equi-join, never all-pairs. The MLlib-cells variant remains the "
    "quality path as operators/similarity.py ivf_topk, recall-tested "
    "in tests/test_extensions.py.",
)
def sim_ivf_topk(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.functions.vectors import (
        cosine_similarity,
    )

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_QV_SPARK).alias("qv"), "embedding"
    )
    corpus = emb.where(F.col("vec_id") >= 5)
    queries = emb.where(F.col("vec_id") < 5)
    x = _lloyd_explode(corpus).localCheckpoint(eager=False)
    cent, assign, _ = _lloyd_fit(x, _lloyd_seed_cent(corpus))
    cells = assign.select("vec_id", F.col("cid").alias("cell"))
    wq = W.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cid"))
    probes = (
        _lloyd_dists(_lloyd_explode(queries), cent)
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= _IVF_PROBE)
        .select(
            F.col("vec_id").alias("query_id"), F.col("cid").alias("cell")
        )
    )
    cand = (
        probes.join(cells, "cell")
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    scored = (
        cand.join(
            queries.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            ),
            "query_id",
        )
        .join(
            corpus.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("cand_vec"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity("query_vec", "cand_vec").alias("cos"),
        )
    )
    wr = W.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= _IVF_K)
        .select("query_id", "neighbor_id", "cos", "rank")
        .orderBy("query_id", "rank")
    )
