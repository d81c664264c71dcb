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
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
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
