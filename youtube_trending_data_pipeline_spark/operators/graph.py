"""Iterative graph algorithms as DataFrame programs.

connected_components lives in operators/components.py; this module adds
PageRank. The catalog entry uses INTEGER arithmetic throughout —
ranks are scaled to 10^12 "units", per-edge contributions use integer
division, and the damping blend is ``(85 * sum) div 100`` — because
integer sums are exact and order-independent under any partitioning,
which is what lets an iterative distributed algorithm be checked
bit-for-bit against a declarative SQL oracle (float PageRank would
differ in the last ulp per shuffle order). The truncation per edge is
bounded by outdeg ulps of 10^-12 per node per round — far below any
ranking-relevant difference.

Scale shape: each iteration is one equi-join of the rank vector onto
the edge list plus one hash aggregate — the standard Pregel-on-a-join
formulation. Lineage is cut with localCheckpoint per round (same policy
as components.py) so the plan does not grow with iteration count; at
100 TB the edge list would be bucketed by src so every round's join is
shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # 10^12 rank units


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Integer-unit PageRank over a directed edge list.

    Returns (node, rank) with rank in units of SCALE = 10^12 after
    ``iterations`` synchronous rounds from a uniform start. Dangling
    nodes (no out-edges) leak their rank — the standard simplified
    formulation; the oracle mirrors it.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if checkpoint:
        # the edge list is reused every round — without cutting its
        # lineage here, each iteration would recompute the upstream
        # join/distinct that produced it (measured 13.5 s -> see PERF.md)
        e = e.localCheckpoint(eager=False)
    # NOTE (r13 measured negative result, kept for the record): folding
    # outdeg onto the checkpointed edge row to save the per-round
    # outdeg join LOSES at bench scale — the planner already broadcasts
    # the node-sized outdeg frame there, so the fold only widened the
    # per-round sort-merge rows and added a materialization job
    # (pagerank 3.16 s -> 3.85 s isolated min-of-5). At cluster scale
    # the same join degrades to a second shuffle per round, but the
    # adaptive planner makes that call from sizes — leave it to AQE.
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if checkpoint:
        outdeg = outdeg.localCheckpoint(eager=False)
        nodes = nodes.localCheckpoint(eager=False)
    base = (100 - damping_pct) * SCALE // 100
    ranks = nodes.select("node", F.lit(SCALE).cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div outdeg").alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
                ).alias("rank"),
            )
        )
        # NO per-round ranks checkpoint: the rank recurrence is a pure
        # LINEAR chain (ranks_{i+1} references ranks_i exactly once),
        # so the unrolled plan grows linearly and nothing re-executes —
        # only the REUSED frames (e / outdeg / nodes, referenced every
        # round) need their lineage cut above. Measured round 8: the
        # per-round materializations were pure overhead, 2.92 s ->
        # 0.57 s for 5 rounds on the 1.17M-edge bench graph.
    return ranks


def triangle_counts(
    edges: DataFrame, u: str = "u", v: str = "v"
) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph.

    ``edges`` holds each undirected edge exactly once (``u < v``).
    Before the wedge join the edges are re-oriented by total degree —
    the classic degree-ordered orientation (Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW'11):
    every edge points from its lower-(degree, id) endpoint to the
    higher one, so a node's wedge fan-out is bounded by O(sqrt(m))
    instead of its raw degree. That bound is what keeps the join's
    intermediate size manageable on power-law graphs at 100 TB; the
    triangle SET is orientation-invariant, so a SQL oracle can verify
    with plain id-ordered enumeration.

    Plan shape: one vocabulary-sized degree aggregate, two node-keyed
    joins to attach rank keys, one self-join on the wedge apex, one
    equi-join against the closing edge, one final hash aggregate.
    Returns (node, n_triangles) for every node in >= 1 triangle.
    """
    e = edges.select(F.col(u).alias("a"), F.col(v).alias("b"))
    deg = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # unique total-order rank key: degree-major, id-minor; deg < 2^31 and
    # node ids < 2^31 keep the composite inside int64
    rk = (F.col("deg") * F.lit(1 << 32) + F.col("node")).alias("rk")
    ra = deg.select(F.col("node").alias("a"), rk.alias("rk_a"))
    rb = deg.select(F.col("node").alias("b"), rk.alias("rk_b"))
    keyed = e.join(ra, "a").join(rb, "b")
    oriented = keyed.select(
        F.when(F.col("rk_a") < F.col("rk_b"), F.col("a"))
        .otherwise(F.col("b"))
        .alias("src"),
        F.when(F.col("rk_a") < F.col("rk_b"), F.col("b"))
        .otherwise(F.col("a"))
        .alias("dst"),
        F.greatest("rk_a", "rk_b").alias("rk_dst"),
    )
    w1 = oriented.select(
        F.col("src").alias("apex"),
        F.col("dst").alias("x"),
        F.col("rk_dst").alias("rk_x"),
    )
    w2 = oriented.select(
        F.col("src").alias("apex"),
        F.col("dst").alias("y"),
        F.col("rk_dst").alias("rk_y"),
    )
    wedges = w1.join(w2, "apex").where(F.col("rk_x") < F.col("rk_y"))
    closing = oriented.select(
        F.col("src").alias("x"), F.col("dst").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"]).select("apex", "x", "y")
    return (
        tri.select(
            F.explode(F.array("apex", "x", "y")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


HITS_SCALE = 1_000_000  # 10^6 score units (keeps raw_sum * SCALE << 2^63)


def hits_integer(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Integer-unit HITS (Kleinberg, JACM'99) over a directed edge list.

    Hub/authority mutual recursion with max-normalization instead of the
    textbook L2 norm: after each half-step every score is rescaled to
    ``score * HITS_SCALE div max(score)``. Both the sums and the global
    max are exact integer aggregates, so the fixed point of ``iterations``
    synchronous rounds is bit-identical across partitionings and engines
    (L2 normalization would put a float sqrt in every round). Rank order
    is unaffected — normalization is a positive monotone rescale.

    Returns (node, kind, score) with kind in ('hub', 'auth'). Scores use
    HITS_SCALE = 10^6 units: with in-degree bounded by ~10^6 the raw sum
    stays <= 10^12 and the rescale product <= 10^18 < 2^63; a 100 TB graph
    with larger degrees would bump to int128-by-splitting or rescale
    before the multiply (documented, not needed at any test SF).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if checkpoint:
        e = e.localCheckpoint(eager=False)
    if iterations == 0:
        # degenerate uniform initialization (not a crash) — the only
        # case that still needs the endpoint-distinct frames
        hubs = e.select(F.col("src").alias("node")).distinct()
        auths = e.select(F.col("dst").alias("node")).distinct()
        h = hubs.select(
            "node", F.lit(HITS_SCALE).cast("long").alias("score")
        )
        a = auths.select(
            "node", F.lit(HITS_SCALE).cast("long").alias("score")
        )
    for i in range(iterations):
        if i == 0:
            # r13: the uniform start makes round 1's authority
            # half-step sum a CONSTANT over in-edges — sum of
            # h(u) = HITS_SCALE per edge IS indeg(v) * HITS_SCALE, so
            # one degree aggregate replaces the rank join, and the
            # hubs/auths endpoint-distinct frames (two exchanges + two
            # lineage cuts that existed only to seed the uniform
            # scores) drop out of the iterated path entirely.
            a_raw = e.groupBy("dst").agg(
                (F.count(F.lit(1)) * HITS_SCALE).alias("raw")
            ).select(F.col("dst").alias("node"), "raw")
        else:
            # authority half-step: a_raw(v) = sum of h(u) over u->v
            a_raw = (
                e.join(h, e["src"] == h["node"])
                .groupBy("dst")
                .agg(F.sum("score").alias("raw"))
                .select(F.col("dst").alias("node"), "raw")
            )
        a = _max_normalize(a_raw)
        # hub half-step: h_raw(u) = sum of a(v) over edges u->v
        h_raw = (
            e.join(a, e["dst"] == a["node"])
            .groupBy("src")
            .agg(F.sum("score").alias("raw"))
            .select(F.col("src").alias("node"), "raw")
        )
        h = _max_normalize(h_raw)
        if checkpoint:
            a = a.localCheckpoint(eager=False)
            h = h.localCheckpoint(eager=False)
    return h.select("node", F.lit("hub").alias("kind"), "score").unionAll(
        a.select("node", F.lit("auth").alias("kind"), "score")
    )


def _max_normalize(raw: DataFrame) -> DataFrame:
    """score = raw * HITS_SCALE div max(raw) — 1-row broadcast max."""
    mx = raw.agg(F.max("raw").alias("mx"))
    return raw.crossJoin(F.broadcast(mx)).select(
        "node", F.expr(f"(raw * {HITS_SCALE}) div mx").alias("score")
    )


def label_propagation_sync(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Synchronous label propagation (community detection; Raghavan et
    al. 2007) with DETERMINISTIC tie-break: every node starts labeled
    with its own id; each round, a node adopts the most frequent label
    among its in-neighbors, ties broken by smallest label; a node with
    no labeled in-neighbor (in-degree 0 on a directed graph) KEEPS its
    current label, so every node of the input graph appears in the
    output every round. The classic
    async/random-order LPA is irreproducible by design; the synchronous
    + min-label variant is a pure function of the graph, so the oracle
    replays it as unrolled CTE rounds (same doctrine as
    pagerank_integer) — and it is NOT min-label connected components
    (components.py): frequency wins before label order, so dense
    communities keep distinct labels instead of collapsing to one.

    Scale shape per round: one equi-join of the label vector onto the
    static edge list + one (dst, label) count aggregate + one per-node
    argmax window; lineage cut via localCheckpoint. Under a
    src-bucketed edge table every round's join is edge-side
    shuffle-free (the PageRank/HITS bucketing claim, proven in
    tests/test_bucketing.py).
    """
    from pyspark.sql import Window

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if checkpoint:
        e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=False)
    labels = nodes.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("label"))
    for _ in range(iterations):
        counted = (
            e.join(labels, e["src"] == labels["node"])
            .groupBy(e["dst"].alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        adopted = (
            counted.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        # keep-own-label fallback: nodes with no labeled in-neighbor
        # (in-degree 0) would otherwise vanish from the result
        labels = labels.join(adopted, "node", "left").select(
            "node", F.coalesce("new_label", "label").alias("label")
        )
        if checkpoint:
            labels = labels.localCheckpoint(eager=False)
    return labels


def personalized_pagerank_integer(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 4,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    checkpoint: bool = True,
) -> DataFrame:
    """Personalized PageRank (random walk with restart to a SEED set) —
    the recommender / trust-propagation variant: instead of uniform
    teleport, the (1 - d) restart mass returns ONLY to seed nodes, so
    rank measures proximity to the seeds rather than global centrality
    (Haveliwala, WWW'02; the Pinterest Pixie shape). Integer units like
    pagerank_integer: seeds start at SCALE, everything else at 0, each
    round is one equi-join + one hash aggregate, and the restart adds
    (100-d)% * SCALE to seeds only — all BIGINT sums and floor
    divisions, so the fixed point replays bit-exactly as unrolled SQL.

    Non-seed dangling mass leaks (same simplified formulation as
    pagerank_integer); at 100 TB the edge side reuses the bucketed
    layout proven in tests/test_bucketing.py.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if checkpoint:
        e = e.localCheckpoint(eager=False)
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    seed_nodes = seeds.select(F.col(seed_col).alias("node")).distinct()
    if checkpoint:
        outdeg = outdeg.localCheckpoint(eager=False)
        nodes = nodes.localCheckpoint(eager=False)
        seed_nodes = seed_nodes.localCheckpoint(eager=False)
    is_seed = F.when(F.col("snode").isNotNull(), 1).otherwise(0)
    tagged = nodes.join(
        seed_nodes.select(F.col("node").alias("snode")),
        nodes["node"] == F.col("snode"),
        "left",
    ).select("node", is_seed.alias("seed"))
    if checkpoint:
        tagged = tagged.localCheckpoint(eager=False)
    base = (100 - damping_pct) * SCALE // 100
    ranks = tagged.select(
        "node", (F.col("seed") * SCALE).cast("long").alias("rank")
    )
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div outdeg").alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            tagged.join(sums, "node", "left")
            .select(
                "node",
                (
                    F.col("seed") * F.lit(base)
                    + F.expr(
                        f"({damping_pct} * coalesce(s, 0)) div 100"
                    )
                )
                .cast("long")
                .alias("rank"),
            )
        )
        # no per-round checkpoint — linear recurrence, see
        # pagerank_integer (only the reused e/outdeg/tagged frames
        # need lineage cuts)
    return ranks


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Fixed-round synchronous k-core peeling (Seidman 1983): each round
    removes EVERY vertex whose current degree is below ``k``, plus all
    its incident edges, simultaneously. Input must be a symmetric edge
    list (both directions present); returns the surviving vertices with
    their degree inside the k-core as ``(node, core_deg)``.

    Fixed ``rounds`` instead of a convergence loop so the result is a
    pure function replayable by an unrolled-CTE DuckDB oracle (the
    pagerank/LPA doctrine) with zero driver-side actions: peeling is
    monotone, so any round past the fixpoint is a no-op and a generous
    round budget costs only empty-delta iterations. Scale shape per
    round: one degree aggregate + two semi-joins against the survivor
    set; lineage cut via localCheckpoint. Under a src-bucketed edge
    table the degree aggregate is shuffle-free (the PageRank bucketing
    claim, tests/test_bucketing.py).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if checkpoint:
        e = e.localCheckpoint(eager=False)
    for i in range(rounds):
        # lineage cut every OTHER round: per-round cuts pay one extra
        # materialization per round for nothing (A/B at sf0.1: 4.5 s ->
        # 2.8 s for 16 rounds at every=2; every=4 regresses to 3.3 s as
        # the doubled-plan growth starts to bite — PERF.md round 6)
        cut = checkpoint and (i % checkpoint_every == checkpoint_every - 1)
        surv = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= k)
            .select(F.col("src").alias("node"))
        )
        if cut:
            surv = surv.localCheckpoint(eager=False)
        e = e.join(surv, e["src"] == surv["node"], "left_semi")
        e = e.join(surv, e["dst"] == surv["node"], "left_semi")
        if cut:
            e = e.localCheckpoint(eager=False)
    return e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("core_deg")
    )


def ktruss_peel(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-round k-truss peeling (Cohen 2008): each round computes the
    SUPPORT of every edge (the number of triangles it closes) and
    removes, simultaneously, every edge with support < k-2. Input is a
    CANONICAL undirected edge list (src < dst, one row per edge);
    returns the surviving truss edges with their fixpoint support as
    ``(src, dst, support)``.

    Same doctrine as kcore_peel: a fixed round budget past the measured
    fixpoint instead of a convergence loop, so the operator is a pure
    function replayable by an unrolled-CTE oracle with zero driver
    actions. Per round: one symmetrize union + a wedge join (the
    triangle-counting cost shape, bounded here by the mutual-kNN cap on
    degree) + one support aggregate + one filtering join; lineage cut
    per round. An edge in no triangle simply gets no support row — the
    inner join drops it, which IS support 0 < k-2 for every k >= 3.
    """
    cur = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if checkpoint:
        cur = cur.localCheckpoint(eager=False)

    def support(e: DataFrame) -> DataFrame:
        sym = e.select("src", "dst").unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        x = sym.select(F.col("src").alias("xa"), F.col("dst").alias("xc"))
        y = sym.select(F.col("src").alias("yb"), F.col("dst").alias("yc"))
        return (
            e.join(x, e["src"] == x["xa"])
            .join(y, (e["dst"] == y["yb"]) & (x["xc"] == y["yc"]))
            .groupBy(e["src"], e["dst"])
            .agg(F.count(F.lit(1)).cast("long").alias("support"))
        )

    for _ in range(rounds):
        sup = support(cur).where(F.col("support") >= k - 2)
        cur = cur.join(sup.select("src", "dst"), ["src", "dst"], "left_semi")
        if checkpoint:
            cur = cur.localCheckpoint(eager=False)
    return support(cur)
