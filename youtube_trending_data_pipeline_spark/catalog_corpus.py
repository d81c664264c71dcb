"""Catalog extensions, round 5 continuation: corpus-curation and graph
operators a large-scale training-data pipeline needs beyond the round-4
surface — passage-level dedup (CCNet-style), TF-IDF term extraction,
count-min-sketch frequency estimation, degree-oriented triangle
counting, Z-order data layout statistics, LM-frequency document scoring
and a BPE tokenizer-training merge step.

Same doctrine as catalog_ext.py: every aggregate is exact-integer (or a
fixed-order fold), every oracle is a bit-exact DuckDB replay, and every
plan is the one you would want at 100 TB (map-side HOFs, vocabulary-
scale shuffles, degree-bounded joins, no UDFs, no driver loops).
"""

from __future__ import annotations

# Registration-order chain (VERDICT r10 item 6): importing this
# module directly must register catalog_tpch's entries first, so QUERIES
# keeps the canonical _load_extensions() order from ANY entry point
# (executor-side kernel unpickling imports catalog modules directly).
import youtube_trending_data_pipeline_spark.catalog_tpch  # noqa: F401,E501 isort:skip

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from youtube_trending_data_pipeline_spark.catalog import register, t, ts_micros
from youtube_trending_data_pipeline_spark.operators import dedup as dd

_TOKS_SQL = "list_filter(string_split(lower(text), ' '), x -> x <> '')"

# ---------------------------------------------------------------------------
# Passage-level dedup (CCNet-style)
# ---------------------------------------------------------------------------


@register(
    "passage_dedup",
    f"""
    WITH tk AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), base AS (
      SELECT doc_id, toks, len(toks) AS n FROM tk WHERE len(toks) > 0
    ), px AS (
      SELECT doc_id, i AS pos,
             array_to_string(list_slice(toks, i * 8 + 1, i * 8 + 8), ' ')
               AS passage
      FROM base, LATERAL (
        SELECT unnest(range(0, (n + 7) // 8)) AS i
      ) g
    ), ranked AS (
      SELECT doc_id, pos, passage,
             ROW_NUMBER() OVER (PARTITION BY passage
                                ORDER BY doc_id, pos) AS rn
      FROM px
    ), keptagg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             string_agg(passage, ' ' ORDER BY pos) AS clean_text
      FROM ranked WHERE rn = 1 GROUP BY doc_id
    ), totals AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_passages
      FROM px GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_passages,
           COALESCE(k.n_kept, 0) AS n_kept,
           COALESCE(k.clean_text, '') AS clean_text
    FROM totals t LEFT JOIN keptagg k USING (doc_id)
    """,
    "CCNet-style passage-level dedup: documents segmented into "
    "consecutive 8-word passages, passages duplicated ANYWHERE in the "
    "corpus dropped except their globally-first (doc_id, pos) "
    "occurrence, and each document rebuilt from its surviving passages "
    "in original order — the curation step that removes boilerplate "
    "repeated across pages while keeping each page's unique prose "
    "(document-level dedup_exact cannot do this). Map-side HOF "
    "segmentation, ONE passage-keyed window shuffle for first-"
    "occurrence ranking, one doc-keyed reassembly aggregate; at 100 TB "
    "the window would key on a passage hash so exchange rows stay "
    "fixed-width (operators/dedup.py:passage_dedup).",
)
def passage_dedup(spark, sf_dir):
    return dd.passage_dedup(
        t(spark, sf_dir, "documents"), id_col="doc_id", text_col="text",
        passage_words=8,
    )


# ---------------------------------------------------------------------------
# TF-IDF top-k terms per document
# ---------------------------------------------------------------------------


@register(
    "text_tfidf_topk",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), n AS (
      SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf
    )
    SELECT doc_id, term, score_scaled, rk FROM (
      SELECT tf.doc_id, tf.term,
             CAST(tf.tf * ((1000000 * n.n_docs) // dfreq.df) AS BIGINT)
               AS score_scaled,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf * ((1000000 * n.n_docs) // dfreq.df) DESC,
                        tf.term) AS rk
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ) WHERE rk <= 3
    """,
    "Top-3 TF-IDF terms per document — the keyword-extraction primitive "
    "behind topic tagging and near-duplicate triage of a pretraining "
    "corpus. IDF is the integer-scaled ratio floor(1e6 * N / df), so "
    "every score is exact BIGINT arithmetic (no cross-engine log() "
    "drift — same doctrine as BM25's RSJ-odds surrogate) and ranking "
    "ties break on term text. Shapes: explode -> (doc,term) hash "
    "aggregate (one corpus shuffle), vocabulary-sized df aggregate "
    "joined back on term (AQE broadcasts the vocab side when small), "
    "1-row N broadcast, doc-keyed window for the top-3. At 100 TB the "
    "explode dominates and partial-aggregates map-side.",
)
def text_tfidf_topk(spark, sf_dir):
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    tok = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(toks).alias("term"))
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.expr("(1000000 * n_docs) div df"))
            .cast("long")
            .alias("score_scaled"),
        )
    )
    rk = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.desc("score_scaled"), "term")
    )
    return (
        scored.withColumn("rk", rk)
        .where(F.col("rk") <= 3)
        .select("doc_id", "term", "score_scaled", "rk")
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------

_CMS_WIDTH = 512
# Carter-Wegman mod 2^31-1 — the same universal family MinHash uses
# (operators/dedup.py:_cw_params31).  Round 12 retired the restricted
# a,b < 2^30 affine family here too: against p = 2^61-1 it wraps at most
# once, i.e. is near-order-preserving, which is weaker than the pairwise
# independence the CMS error bound (Cormode & Muthukrishnan) assumes.
_CMS_PARAMS = dd._cw_params31(4, seed=7)


def _cms_oracle() -> str:
    p = dd._MERSENNE_P31
    h32 = "(('0x' || substr(md5(token), 1, 8))::BIGINT)"
    buckets = ",\n             ".join(
        f"((({h32} % {p}) * {a} + {b}) % {p}) % {_CMS_WIDTH} AS b{r}"
        for r, (a, b) in enumerate(_CMS_PARAMS)
    )
    ests = ",\n             ".join(
        f"CAST(SUM(exact_n) OVER (PARTITION BY b{r}) AS BIGINT) AS e{r}"
        for r in range(4)
    )
    return f"""
    WITH tok AS (
      SELECT unnest({_TOKS_SQL}) AS token FROM documents
    ), vocab AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM tok GROUP BY 1
    ), b AS (
      SELECT token, exact_n,
             {buckets}
      FROM vocab
    ), est AS (
      SELECT token, exact_n,
             {ests}
      FROM b
    )
    SELECT token, exact_n, least(e0, e1, e2, e3) AS cms_est
    FROM est
    ORDER BY exact_n DESC, token
    LIMIT 20
    """


@register(
    "cms_heavy_hitters",
    _cms_oracle(),
    "Count-min sketch frequency estimation, audited against exact "
    "counts: token frequencies folded into a 4x512 CMS (4 seeded "
    "Carter-Wegman rows mod 2^31-1 over the portable md5-derived 32-bit "
    "base hash — the same universal family as minhash, as the CMS error "
    "bound assumes), estimate = min over rows, reported "
    "for the top-20 exact heavy hitters so the CMS >= exact invariant "
    "and the collision overestimates are both visible. The sketch is "
    "built from the VOCABULARY aggregate, not the token stream — "
    "identical estimates, and the 4 window sums run over vocab-sized "
    "data (at 100 TB: the token->count aggregate partial-aggregates "
    "map-side; a production CMS would merge per-partition 4x512 arrays, "
    "a constant-size reduce — this entry verifies the estimate "
    "semantics those merges must reproduce). All-integer, bit-exact.",
)
def cms_heavy_hitters(spark, sf_dir):
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    vocab = (
        t(spark, sf_dir, "documents")
        .select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    b = vocab.withColumn("h32", dd.portable_hash32("token"))
    for r, (a, bb) in enumerate(_CMS_PARAMS):
        b = b.withColumn(
            f"b{r}",
            (
                ((F.col("h32") % F.lit(dd._MERSENNE_P31)) * F.lit(a) + F.lit(bb))
                % F.lit(dd._MERSENNE_P31)
            )
            % F.lit(_CMS_WIDTH),
        )
    for r in range(4):
        b = b.withColumn(
            f"e{r}", F.sum("exact_n").over(W.partitionBy(f"b{r}"))
        )
    return (
        b.select(
            "token",
            "exact_n",
            F.least("e0", "e1", "e2", "e3").alias("cms_est"),
        )
        .orderBy(F.desc("exact_n"), "token")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Triangle counting (degree-ordered orientation)
# ---------------------------------------------------------------------------


@register(
    "graph_triangle_count",
    """
    WITH li AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity <= 25
    ), e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), tri AS (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM e e1
      JOIN e e2 ON e1.v = e2.u
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    ) GROUP BY node
    """,
    "Per-node triangle counts over the part co-purchase graph (parts "
    "appearing in the same order, low-quantity lineitems) — the graph "
    "clustering-coefficient primitive behind community detection and "
    "link-spam scoring of a crawl graph. The Spark side uses degree-"
    "ordered orientation (Suri & Vassilvitskii WWW'11): edges point "
    "from the lower-(degree,id) endpoint to the higher, capping wedge "
    "fan-out at O(sqrt(m)) per node — THE at-scale algorithm for "
    "power-law graphs, where id-ordered enumeration dies on the last "
    "reducer. The triangle set is orientation-invariant, so the oracle "
    "verifies with plain id-ordered SQL joins. operators/graph.py:"
    "triangle_counts.",
)
def graph_triangle_count(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    li = (
        t(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") <= 25)
        .select("l_orderkey", "l_partkey")
    )
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    return triangle_counts(edges)


# ---------------------------------------------------------------------------
# Z-order layout statistics
# ---------------------------------------------------------------------------


def _morton_spark(x: str, y: str) -> str:
    return " + ".join(
        f"(shiftleft(shiftright({x}, {i}) & 1, {2 * i}) + "
        f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1}))"
        for i in range(16)
    )


def _morton_duck(x: str, y: str) -> str:
    return " + ".join(
        f"(((({x} >> {i}) & 1) << {2 * i}) + "
        f"((({y} >> {i}) & 1) << {2 * i + 1}))"
        for i in range(16)
    )


@register(
    "zorder_layout_stats",
    f"""
    WITH d AS (
      SELECT (o_custkey & 65535) AS x,
             ((epoch_us(o_orderdate) // 86400000000) & 65535) AS y
      FROM orders
    ), z AS (
      SELECT x, y, ({_morton_duck("x", "y")}) AS zval FROM d
    )
    SELECT (zval >> 22) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(x) AS min_cust, MAX(x) AS max_cust,
           MIN(y) AS min_day, MAX(y) AS max_day
    FROM z GROUP BY 1
    """,
    "Z-order (Morton) data-layout statistics: orders keyed by the "
    "bit-interleave of (customer, order-day), bucketed on the top 10 "
    "z-bits, with per-bucket min/max of BOTH dimensions — the layout "
    "optimization behind multi-dimensional data skipping (Delta/Iceberg "
    "OPTIMIZE ZORDER BY): sorting 100 TB by zval bounds every file's "
    "span in customer AND date simultaneously, so either predicate "
    "prunes files, where a lexicographic sort bounds only its leading "
    "column. The interleave is 32 shift-mask expressions, pure codegen; "
    "one bucket-keyed hash aggregate; epoch-day via exact integer "
    "micros division (dtype-dispatched like every ts column).",
)
def zorder_layout_stats(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    od_dtype = dict(orders.dtypes).get("o_orderdate", "")
    # exact integer day: div, not /, to avoid double rounding (PERF.md)
    d = orders.select(
        (F.col("o_custkey").bitwiseAND(F.lit(65535))).alias("x"),
        ts_micros(od_dtype, "o_orderdate").alias("_us"),
    ).select(
        "x",
        (F.expr("_us div 86400000000").bitwiseAND(F.lit(65535))).alias("y"),
    )
    z = d.select("x", "y", F.expr(_morton_spark("x", "y")).alias("zval"))
    return (
        z.select(
            F.expr("shiftright(zval, 22)").alias("bucket"), "x", "y"
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_cust"),
            F.max("x").alias("max_cust"),
            F.min("y").alias("min_day"),
            F.max("y").alias("max_day"),
        )
    )


# ---------------------------------------------------------------------------
# LM-frequency document scoring
# ---------------------------------------------------------------------------


@register(
    "lm_bigram_doc_score",
    f"""
    WITH tk AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), big AS (
      SELECT doc_id, toks[i + 1] AS w1, toks[i + 2] AS w2
      FROM tk, LATERAL (
        SELECT unnest(range(0, greatest(len(toks) - 1, 0))) AS i
      ) g
      WHERE len(toks) >= 2
    ), cnt AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
      FROM big GROUP BY 1, 2
    )
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST((1000000 * SUM(c.c)) // COUNT(*) AS BIGINT)
             AS avg_freq_ppm
    FROM big b JOIN cnt c USING (w1, w2)
    GROUP BY b.doc_id
    """,
    "Language-model-frequency document scoring: every document scored "
    "by the mean corpus frequency of its adjacent bigrams (scaled ppm, "
    "exact integer arithmetic) — the shape of a perplexity-based "
    "quality filter (CCNet's KenLM stage): documents whose n-grams are "
    "common in the corpus score high, gibberish scores low. Completes "
    "the ngram_lm_counts story: that entry builds the count table, "
    "this one JOINS documents against it and reduces per doc. Map-side "
    "HOF bigram generation, one (w1,w2)-keyed count aggregate, one "
    "equi-join of doc bigrams onto the count table (AQE broadcasts the "
    "table when it fits), one doc-keyed aggregate. At 100 TB the "
    "count-table join is the canonical skew case — stopword bigrams — "
    "absorbed by partial aggregation on the build side and AQE skew "
    "split on the probe.",
)
def lm_bigram_doc_score(spark, sf_dir):
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    docs = (
        t(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("_toks"))
        .where(F.size("_toks") >= 2)
    )
    big = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(_toks) - 2), i -> "
                "struct(_toks[i] AS w1, _toks[i + 1] AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    cnt = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    return (
        big.join(cnt, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr("CAST((1000000 * sum(c)) div count(1) AS BIGINT)").alias(
                "avg_freq_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# BPE tokenizer-training merge step
# ---------------------------------------------------------------------------


@register(
    "bpe_merge_step",
    f"""
    WITH words AS (
      SELECT unnest({_TOKS_SQL}) AS w FROM documents
    ), wc AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM words GROUP BY 1
    ), pairs AS (
      SELECT substr(w, i, 2) AS pair, n
      FROM wc, LATERAL (SELECT unnest(range(1, len(w))) AS i) g
      WHERE len(w) >= 2
    )
    SELECT pair, CAST(SUM(n) AS BIGINT) AS pair_count
    FROM pairs GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT 10
    """,
    "BPE tokenizer-training merge step: the top-10 adjacent symbol "
    "pairs by corpus frequency — exactly the statistic a BPE trainer "
    "computes each merge round (the argmax pair becomes the next merge "
    "rule). Counts are weighted by word frequency and computed over "
    "the VOCABULARY (distinct words), not the token stream — the "
    "standard trainer optimization, identical results at a fraction of "
    "the work, and the vocab aggregate is the only corpus-scale "
    "shuffle. Pair generation is a map-side HOF over vocab rows; ties "
    "break on pair text; all-integer. A full training loop iterates "
    "this entry with the argmax merged into the vocab between rounds — "
    "each round one Spark job over vocab-sized data.",
)
def bpe_merge_step(spark, sf_dir):
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    wc = (
        t(spark, sf_dir, "documents")
        .select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = (
        wc.where(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1), "
                    "i -> substring(w, i, 2))"
                )
            ).alias("pair"),
            "n",
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "pair")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# SemDeDup (cluster-then-dedup-within-cluster)
# ---------------------------------------------------------------------------


def _semdedup_oracle(threshold: float = 0.25) -> str:
    """Replay of the round-8 all-integer SemDeDup: milli quantization,
    argmin integer-L2 cells over corpus-relative seeds, the rational
    q^2*dot^2 >= p^2*na2*nb2 pair predicate, recursive closure."""
    from youtube_trending_data_pipeline_spark.operators.dedup import (
        _SEMDEDUP_CELL_SIZE,
        _SEMDEDUP_MILLI,
        _semdedup_threshold_frac,
    )

    p, q = _semdedup_threshold_frac(threshold)
    qmil = (
        "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
        f" * {_SEMDEDUP_MILLI} + 0.5) AS BIGINT))"
    )
    d2 = (
        "list_sum(list_transform(list_zip(c.qv, s.seed_qv),"
        " pr -> (pr[1] - pr[2]) * (pr[1] - pr[2])))"
    )
    return f"""
    WITH RECURSIVE corpus AS (
      SELECT vec_id, {qmil} AS qv FROM embeddings
    ), ncs AS (
      SELECT GREATEST(8, COUNT(*) // {_SEMDEDUP_CELL_SIZE}) AS n_cells
      FROM corpus
    ), seeds AS (
      SELECT vec_id AS seed_id, qv AS seed_qv FROM (
        SELECT vec_id, qv, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
        FROM corpus
      ) r, ncs WHERE r.rn <= ncs.n_cells
    ), cells AS (
      SELECT vec_id, cell FROM (
        SELECT c.vec_id, s.seed_id AS cell,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id
                                  ORDER BY {d2} ASC, s.seed_id ASC) AS rn
        FROM corpus c, seeds s
      ) WHERE rn = 1
    ), scored AS (
      SELECT ca.vec_id AS id_a, cb.vec_id AS id_b,
             list_sum(list_transform(list_zip(a.qv, b.qv),
                      pr -> pr[1] * pr[2])) AS dot,
             list_sum(list_transform(a.qv, x -> x * x)) AS na2,
             list_sum(list_transform(b.qv, x -> x * x)) AS nb2
      FROM cells ca
      JOIN cells cb ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
      JOIN corpus a ON a.vec_id = ca.vec_id
      JOIN corpus b ON b.vec_id = cb.vec_id
    ), pairs AS (
      SELECT id_a, id_b FROM scored
      WHERE dot >= 0 AND na2 > 0 AND nb2 > 0
        AND {q * q} * dot * dot >= {p * p} * na2 * nb2
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ), reach(node, root) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
    ), comp AS (
      SELECT node, MIN(root) AS component FROM reach GROUP BY node
    )
    SELECT ce.vec_id, ce.cell,
           COALESCE(p.component, ce.vec_id) AS rep_id,
           (COALESCE(p.component, ce.vec_id) = ce.vec_id) AS kept
    FROM cells ce LEFT JOIN comp p ON p.node = ce.vec_id
    """


@register(
    "semdedup_keepers",
    _semdedup_oracle(),
    "SemDeDup (Abbas et al. 2023) — semantic dedup of an embedding "
    "corpus by cluster-then-dedup-within-cluster, ALL-INTEGER since "
    "round 8: milli-quantized vectors, argmin integer-L2 cells over "
    "the first GREATEST(8, n // 250) vectors by id (corpus-relative "
    "like the mutual-kNN knob, derived from COUNT(*) on both "
    "engines), within-cell pairs by the rational predicate "
    "q^2*dot^2 >= p^2*|a|^2*|b|^2 (threshold 1/4 exactly), transitive "
    "closure into duplicate groups, keep the min-id representative. "
    "One row per vector: (vec_id, cell, rep_id, kept). The pair test "
    "runs as ONE exact float64-BLAS Gram matrix per cell in an Arrow "
    "kernel — replacing the per-pair interpreted HOF cosine that "
    "dominated this entry's bench time (HOFs evaluate a closure per "
    "element; measured in PERF.md round 8). The oracle replays the "
    "ENTIRE pipeline including the recursive closure. At 100 TB: "
    "cells stay ~250 vectors as the corpus grows, the kernel "
    "shuffles (id, qv) once by cell, and the closure is the O(log n) "
    "min-label rounds of operators/components.py. "
    "operators/dedup.py:semdedup_keepers.",
)
def semdedup_keepers(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.operators.dedup import (
        _SEMDEDUP_CELL_SIZE,
    )

    emb = t(spark, sf_dir, "embeddings")
    n_cells = max(8, emb.count() // _SEMDEDUP_CELL_SIZE)
    return dd.semdedup_keepers(
        emb, id_col="vec_id",
        vec_col="embedding", n_cells=n_cells, threshold=0.25,
    )


# ---------------------------------------------------------------------------
# Tokenize-to-ids (vocab build + encode)
# ---------------------------------------------------------------------------


@register(
    "tokenize_to_ids",
    f"""
    WITH tk AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), pos AS (
      SELECT doc_id, i AS pos, toks[i + 1] AS tok
      FROM tk, LATERAL (
        SELECT unnest(range(0, len(toks))) AS i
      ) g
      WHERE len(toks) > 0
    ), vc AS (
      SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS c
      FROM pos GROUP BY 1
    ), vocab AS (
      SELECT token,
             CAST(ROW_NUMBER() OVER (ORDER BY c DESC, token) AS BIGINT)
               AS id
      FROM vc WHERE c >= 2
    )
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unk,
           string_agg(CAST(COALESCE(v.id, -1) AS VARCHAR), ','
                      ORDER BY p.pos) AS ids_csv
    FROM pos p LEFT JOIN vocab v ON v.token = p.tok
    GROUP BY p.doc_id
    """,
    "Corpus tokenization to integer ids — the encode step between "
    "tokenizer training (bpe_merge_step) and sequence packing "
    "(pack_sequences_linear): build a frequency-ranked vocabulary "
    "(count >= 2; rank ties break on token text), map every token "
    "position through it (OOV -> -1 UNK), and emit each document's id "
    "sequence in original order plus token/UNK counts. Shapes: "
    "map-side posexplode, one (token) count aggregate, the id "
    "assignment window runs over the VOCABULARY (tokenizer vocabs are "
    "~100k rows — driver-safe at any corpus scale), one token->id "
    "equi-join (AQE broadcasts the vocab), one doc-keyed ordered "
    "reassembly. The id join is the classic skew case (stopwords) — "
    "absorbed by broadcast.",
)
def tokenize_to_ids(spark, sf_dir):
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    pos = (
        t(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("_toks"))
        .where(F.size("_toks") > 0)
        .select("doc_id", F.posexplode("_toks").alias("pos", "tok"))
    )
    vc = pos.groupBy(F.col("tok").alias("token")).agg(
        F.count(F.lit(1)).alias("c")
    )
    vocab = (
        vc.where(F.col("c") >= 2)
        .withColumn(
            "id",
            F.row_number()
            .over(W.orderBy(F.desc("c"), "token"))
            .cast("long"),
        )
        .select("token", "id")
    )
    joined = pos.join(
        F.broadcast(vocab), pos["tok"] == vocab["token"], "left"
    )
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("id").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_unk"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "pos",
                            F.coalesce("id", F.lit(-1)).alias("_id"),
                        )
                    )
                ),
                lambda s: s["_id"].cast("string"),
            ),
            ",",
        ).alias("ids_csv"),
    )


# ---------------------------------------------------------------------------
# k-NN label classification
# ---------------------------------------------------------------------------


def _knn_oracle(k: int = 3) -> str:
    from youtube_trending_data_pipeline_spark.catalog_ext import _COS_SQL

    cos = _COS_SQL.format(a="q.embedding", b="c.embedding")
    return f"""
    WITH nn AS (
      SELECT query_id, neighbor_id, label FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {cos} DESC, c.vec_id ASC)
                 AS rank
        FROM embeddings q, embeddings c
        WHERE q.vec_id < 5 AND c.vec_id >= 5
      ) WHERE rank <= {k}
    ), votes AS (
      SELECT query_id, label, CAST(COUNT(*) AS BIGINT) AS votes
      FROM nn GROUP BY 1, 2
    )
    SELECT query_id, label AS predicted_label, votes FROM (
      SELECT query_id, label, votes,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY votes DESC, label ASC) AS vr
      FROM votes
    ) WHERE vr = 1
    """


@register(
    "sim_knn_classify",
    _knn_oracle(),
    "k-NN label classification over the embedding corpus: each query "
    "vector takes the majority label of its 3 exact-cosine nearest "
    "neighbors (vote ties break on label asc; neighbor ties on id) — "
    "the classifier used for quality/topic/toxicity propagation from "
    "a small labeled seed set to a 100 TB corpus. Composes the "
    "brute-force top-k scan (broadcast queries, corpus-parallel, "
    "per-query TakeOrdered reduction) with a votes-sized argmax "
    "window; at scale the scan swaps for the LSH/IVF candidate path "
    "with identical vote semantics. Exact double cosine (fixed-order "
    "fold, bit-identical both engines), integer votes.",
)
def sim_knn_classify(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.operators import similarity as sim

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.where(F.col("vec_id") >= 5)
    nn = sim.brute_force_topk(corpus, queries, k=3)
    labels = emb.select(
        F.col("vec_id").alias("neighbor_id"), "label"
    )
    votes = (
        nn.join(labels, "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    vr = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("label"))
    )
    return (
        votes.withColumn("vr", vr)
        .where(F.col("vr") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), "votes")
    )


# ---------------------------------------------------------------------------
# Stream-static broadcast enrichment
# ---------------------------------------------------------------------------


@register(
    "stream_static_enrich",
    """
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
    "Stream-static enrichment in the EXACT gate: the events file "
    "streamed availableNow, every micro-batch joined against the "
    "STATIC customer->nation dimension (the stateless stream-static "
    "join Structured Streaming re-plans per batch; Spark broadcasts "
    "the dim side), values accumulated as integer cents in-stream, "
    "aggregated per nation in complete mode — the canonical streaming "
    "ETL shape (clickstream x user dimension) the reference's daily "
    "REST ingestion would become at lakehouse scale. Integer cents "
    "make the result bit-identical to the oracle's batch join under "
    "any micro-batch split.",
)
def stream_static_enrich(spark, sf_dir):
    import os
    import tempfile
    import uuid

    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    dim = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_nationkey")
        .join(
            spark.read.parquet(f"{sf_dir}/nation.parquet").select(
                "n_nationkey", "n_name"
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey").alias("user_id"), "n_name")
    )
    src_dir = tempfile.mkdtemp(prefix="sse-src-")
    os.symlink(f"{sf_dir}/events.parquet", f"{src_dir}/events.parquet")
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(src_dir)
        .select(
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .join(F.broadcast(dim), "user_id")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("total_cents"),
        )
    )
    name = f"sse_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Salted skew join
# ---------------------------------------------------------------------------


@register(
    "j10_salted_skew_join",
    """
    SELECT s.s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY s.s_nationkey
    """,
    "Explicit SALTED join in the exact gate — the manual skew-breaker "
    "for when AQE's runtime skew split isn't available (stream-static "
    "joins, bucketed-table SMJs, engines with AQE off): the fact side "
    "derives salt = l_orderkey % 8, the dimension side explodes 8x "
    "with every salt value, and the join key becomes (s_suppkey, "
    "salt) — so one hot supplier's rows spread over 8 shuffle "
    "partitions instead of one reducer. Salting is result-invariant: "
    "the oracle runs the UNSALTED join. Deterministic salt (no RNG) "
    "keeps reruns identical; integer-cents aggregate; dim explosion "
    "is 8x|suppliers| rows — negligible against the fact shuffle it "
    "de-skews. Complements skew_salted_agg (salted AGGREGATION) and "
    "the AQE skew-join plan gate (tests/test_aqe_skew_join.py).",
)
def j10_salted_skew_join(spark, sf_dir):
    from youtube_trending_data_pipeline_spark.operators.skew import salted_join

    fact = t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    dim = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        salted_join(
            fact, dim, fact_key="l_suppkey", dim_key="s_suppkey",
            salt_from="l_orderkey", salt_buckets=8,
        )
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("cents").alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# n-gram novelty score
# ---------------------------------------------------------------------------


@register(
    "ngram_novelty_score",
    f"""
    WITH tk AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(
        list_transform(range(1, len(toks) - 1),
                       i -> array_to_string(list_slice(toks, i, i + 2), ' '))
      )) AS s
      FROM tk WHERE len(toks) >= 3
    ), df AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY 1
    )
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST((1000000 * SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS novelty_ppm
    FROM sh JOIN df USING (s)
    GROUP BY sh.doc_id
    """,
    "n-gram novelty scoring: per document, the fraction (scaled ppm) "
    "of its DISTINCT word-3-gram shingles that occur in no other "
    "document — the inverse of boilerplate-ness, used to rank crawl "
    "pages by how much genuinely new text they contribute (high "
    "novelty = keep; near-zero = template/mirror page). Same shingle "
    "generation as the minhash pipeline (map-side HOF, list_distinct "
    "per doc), one shingle-keyed df aggregate, one join back, one "
    "doc-keyed integer reduce. At 100 TB the shingle df aggregate is "
    "the minhash shuffle's cost twin — fixed-width hashed keys, "
    "partial map-side combine.",
)
def ngram_novelty_score(spark, sf_dir):
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    sh = (
        t(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("_toks"))
        .where(F.size("_toks") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(0, size(_toks) - 3), i -> "
                        "array_join(slice(_toks, i + 1, 3), ' '))"
                    )
                )
            ).alias("s"),
        )
    )
    df_counts = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(df_counts, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.expr(
                "CAST((1000000 * sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)) "
                "div count(1) AS BIGINT)"
            ).alias("novelty_ppm"),
        )
    )
