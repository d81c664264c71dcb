"""Connected components over a candidate-pair graph (dedup clustering).

Large-scale dedup (MinHash/LSH, SimHash, n-gram Jaccard — operators/dedup.py)
emits *pairs*; turning pairs into keep/drop decisions needs the transitive
closure: if A~B and B~C, then {A,B,C} is one duplicate cluster even though
(A,C) was never scored. This module computes components with iterative
min-label propagation expressed entirely in DataFrame ops:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated until fixpoint. Each iteration is one shuffle join + one partial
aggregate; the number of iterations is the graph diameter. Near-dup graphs
are unions of small dense clusters (diameter 2-4 in practice), so this
converges in a handful of rounds even at 100 TB — the classic
large-star/small-star optimization (Kiveris et al., "Connected Components
in MapReduce and Beyond") only pays off on long-chain graphs, which dedup
graphs are not; the hook is noted below if one ever appears.

Determinism: min() labels are order-independent, so component ids are
stable across partitionings (required by the driver's value-hash gate).
Lineage is cut with localCheckpoint() each round or the plan would double
per iteration and overwhelm the optimizer by round ~15.

Extension beyond the reference pipeline (no counterpart file): the
reference dedups exact video_id only (ingestion.py:239-244 drop_duplicates
shape); clustering near-dup *text* is the training-corpus generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, component) for every vertex in ``edges``.

    ``component`` is the minimum vertex id reachable from the node —
    canonical, deterministic cluster representative ("keeper" id for
    dedup). Isolated vertices never enter ``edges`` and are absent; union
    the full id set afterwards if every row needs a component.

    The loop is driver-side control flow but all data stays distributed;
    the per-iteration convergence check is a LIMIT 1 existence probe, not
    a collect of labels.

    Raises RuntimeError if labels are still changing after ``max_iter``
    rounds — min-label propagation needs diameter rounds, so a graph
    whose diameter exceeds the budget would otherwise return silently
    WRONG (merged-too-little) components. Long-chain graphs should use
    connected_components_star (O(log n) rounds) instead.
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"min-label propagation did not converge in {max_iter} rounds "
            "(graph diameter exceeds budget); use connected_components_star"
        )
    return labels.select("node", F.col("label").alias("component"))


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the O(log n)-round scale path for long-chain graphs, where plain
    min-label propagation needs diameter rounds.

    Each round is two star operations; each star is one hash aggregate
    (per-node neighborhood min) plus one join, all on (long, long) rows.
    Convergence = the normalized edge set reaches a fixpoint (star
    forest), checked by count + order-independent hash signature — a pair
    of scalar aggregates, never a collect of the edge list. Raises if not
    converged within ``max_iter`` rounds (for chains that means
    ~log2(length) rounds, asserted in tests).

    Same output contract as connected_components: component = minimum
    reachable vertex id, deterministic under any partitioning.
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sym(pairs: DataFrame) -> DataFrame:
        return pairs.union(
            pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )

    def _neighborhood_min(sym: DataFrame) -> DataFrame:
        return sym.groupBy(F.col("a").alias("u")).agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )

    def _large_star(pairs: DataFrame) -> DataFrame:
        sym = _sym(pairs)
        m = _neighborhood_min(sym)
        return (
            sym.join(m, sym["a"] == m["u"])
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("x"), F.col("m").alias("y"))
        )

    def _small_star(pairs: DataFrame) -> DataFrame:
        directed = _sym(pairs).where(F.col("b") < F.col("a"))
        m = directed.groupBy(F.col("a").alias("u")).agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        out = directed.join(m, directed["a"] == m["u"]).select(
            F.col("b").alias("x"), F.col("m").alias("y")
        )
        return out.union(m.select(F.col("u").alias("x"), F.col("m").alias("y")))

    def _normalize(pairs: DataFrame) -> DataFrame:
        return (
            pairs.where(F.col("x") != F.col("y"))
            .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
            .distinct()
        )

    def _signature(pairs: DataFrame):
        # bit_xor: order-independent and overflow-free under ANSI mode
        # (SUM of 64-bit hashes overflows); edges are distinct so xor
        # cancellation of repeated rows cannot occur
        row = pairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("a", "b")).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    sig = _signature(e)
    for _ in range(max_iter):
        e = _normalize(_small_star(_large_star(e).transform(_normalize))) \
            .localCheckpoint(eager=True)
        new_sig = _signature(e)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(f"star components did not converge in {max_iter} rounds")
    # at fixpoint the edge set is a star forest: every node's neighborhood
    # min (incl. self) is its component root
    return _neighborhood_min(_sym(e)).select(
        F.col("u").alias("node"), F.col("m").alias("component")
    )


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster summary over candidate pairs: one row per component with
    its size and canonical keeper id (the minimum member)."""
    comp = connected_components(pairs, src=id_a, dst=id_b)
    return comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sort_array(F.collect_list("node")).alias("members"),
    )
