"""Similarity search over embedding columns (``array<float>``).

Two paths, mirroring a production ANN stack:

* brute-force top-k — exact cosine against every vector; the correctness
  baseline. The query side is small and broadcast; the corpus side
  streams partition-parallel, so the only shuffle is the final per-query
  top-k reduction (size Q*k after partial aggregation).
* hyperplane-LSH top-k — random-hyperplane sign buckets prune the corpus
  before exact re-ranking; the scale path when Q*N pairs is too large.

All vector math is JVM-side (functions/vectors.py); no Python per row.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from youtube_trending_data_pipeline_spark.functions.vectors import cosine_similarity


def _hyperplanes(dim: int, planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(planes)]


def hyperplane_signature(
    vec: Column, planes: int = 8, seed: int = 7, dim: int = 64
) -> Column:
    """Pack ``planes`` sign bits of random projections into one BIGINT.

    The random planes are fixed constants baked into the plan (seeded),
    so the signature is deterministic and needs no broadcast state.
    """
    hp = _hyperplanes(dim, planes, seed)
    sig = F.lit(0).cast("long")
    for j, plane in enumerate(hp):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(w) for w in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig.bitwiseOR(
            F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k neighbors per query.

    ``queries`` (small) is broadcast; the Q*N similarity scan is
    partition-parallel over the corpus with no shuffle; the final window
    reduces to k rows per query. Ties break on neighbor id ascending."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    pairs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    ).crossJoin(F.broadcast(q))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_similarity("query_vec", "vec").alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    planes: int = 6,
    seed: int = 7,
    tables: int = 4,
) -> DataFrame:
    """Approximate top-k: multi-table hyperplane LSH candidate generation
    followed by exact cosine re-ranking of the (much smaller) candidate
    set. ``tables`` independent plane sets raise recall; a candidate is
    any corpus vector sharing a bucket with the query in any table."""
    def with_buckets(df, idc):
        out = df
        for t in range(tables):
            out = out.withColumn(
                f"b{t}",
                hyperplane_signature(F.col(vec_col), planes=planes, seed=seed + t),
            )
        return out.select(
            F.col(idc).alias("id"),
            F.col(vec_col).alias("vec"),
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(t).alias("tbl"), F.col(f"b{t}").alias("bkt"))
                        for t in range(tables)
                    ]
                )
            ).alias("tb"),
        ).select("id", "vec", "tb.tbl", "tb.bkt")

    c = with_buckets(corpus, id_col).alias("c")
    q = with_buckets(queries, query_id_col).alias("q")
    cands = c.join(
        F.broadcast(q),
        (F.col("c.tbl") == F.col("q.tbl")) & (F.col("c.bkt") == F.col("q.bkt")),
    ).select(
        F.col("q.id").alias("query_id"),
        F.col("c.id").alias("neighbor_id"),
        cosine_similarity(F.col("q.vec"), F.col("c.vec")).alias("cos"),
    )
    # score BEFORE dedup: the distinct then runs on scalar columns only, so
    # Spark picks hash aggregation (arrays in the dedup key force the
    # slower sort-based aggregate); cos is identical across tables per pair
    scored = cands.groupBy("query_id", "neighbor_id").agg(F.max("cos").alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ivf_index(
    corpus: DataFrame,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
):
    """IVF (inverted-file) index: KMeans-partition the corpus; search then
    probes only the closest cells. Returns (assigned corpus, model).

    The production ANN scale path: the corpus is written bucketed by
    ``cell`` so each probe reads only its cells' files; locally the cell
    column drives a partition-pruned filter. Training samples the corpus
    (KMeans on 100 TB trains on a sample; assignment is a single pass).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    model = KMeans(k=n_clusters, seed=seed, featuresCol="features").fit(feat)
    assigned = model.transform(feat).select(
        "id", "vec", F.col("prediction").alias("cell")
    )
    return assigned, model


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k via IVF: assign corpus to KMeans cells, probe the
    ``n_probe`` nearest cells per query, exact cosine re-rank within them."""
    assigned, model = ivf_index(corpus, n_clusters, id_col, vec_col, seed)
    centers = model.clusterCenters()
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    # distance of each query to every center (centers are driver-side
    # constants — tiny), keep n_probe closest cells per query
    center_cols = []
    for ci, center in enumerate(centers):
        dist = F.aggregate(
            F.zip_with(
                F.col("query_vec"),
                F.array(*[F.lit(float(x)) for x in center]),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        center_cols.append(F.struct(dist.alias("d"), F.lit(ci).alias("cell")))
    probed = q.select(
        "query_id",
        "query_vec",
        F.explode(
            F.slice(F.array_sort(F.array(*center_cols)), 1, n_probe)
        ).alias("probe"),
    ).select("query_id", "query_vec", F.col("probe.cell").alias("cell"))
    cands = assigned.join(F.broadcast(probed), "cell").select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        cosine_similarity("query_vec", "vec").alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def label_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid as (label, dim, avg) rows via posexplode — the
    shuffle key is (label, dim) so the reduction is fully parallel (no
    per-label array assembly on a single reducer until the final small
    collect_list)."""
    exploded = embeddings.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "component"),
    )
    return exploded.groupBy("label", "dim").agg(
        F.avg(F.col("component").cast("double")).alias("avg_component")
    )
