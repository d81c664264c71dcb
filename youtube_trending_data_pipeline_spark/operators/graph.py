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
