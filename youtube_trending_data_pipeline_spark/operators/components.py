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
    return labels.select("node", F.col("label").alias("component"))


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
