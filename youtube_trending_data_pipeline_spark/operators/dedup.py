"""Deduplication operators for large-scale training-data pipelines.

Five strategies, all shuffle-architected for the 100 TB target:

* exact          — hash groupBy on normalized content (one shuffle)
* minhash_lsh    — shingle -> minhash signature -> banded bucket join;
                   candidate generation never compares all pairs, cost is
                   O(sum of bucket sizes squared) with small buckets
* simhash        — 64-bit sign-aggregate signature; near-dup = hamming
                   distance <= k found via 4x16-bit band exact-match
                   (pigeonhole: any pair within distance 3 shares a band)
* ngram_jaccard  — exact n-gram Jaccard verification over candidate pairs
                   (blocked self-join; never all-pairs)
* embedding      — cosine near-dup over ``array<float>`` embeddings,
                   blocked by random-hyperplane LSH buckets

Everything is built-in DataFrame ops (higher-order functions + joins);
no Python in the row path. Hash seeds are fixed constants so results are
deterministic run-to-run (required by the driver's value-hash check).
"""

from __future__ import annotations

import random
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from youtube_trending_data_pipeline_spark.functions.text import (
    char_ngrams,
    fingerprint,
    tokens,
    word_ngrams,
)
from youtube_trending_data_pipeline_spark.functions.vectors import cosine_similarity

# Mersenne prime for the affine minhash permutations h_i(x) = (a_i*x+b_i) mod p.
_MERSENNE_P = (1 << 61) - 1


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(
    df: DataFrame, id_col: str, text_col: str, normalized: bool = True
) -> DataFrame:
    """One row per distinct content: keeper id (min), duplicate count.

    Single hash aggregation on the content fingerprint — the canonical
    at-scale exact dedup (group on md5, not the full text, so shuffle rows
    are fixed-width instead of document-sized).
    """
    key = fingerprint(text_col) if normalized else F.md5(F.col(text_col))
    return (
        df.select(F.col(id_col), key.alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def drop_exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep exactly the keeper row per distinct normalized content."""
    keepers = exact_duplicates(df, id_col, text_col).select(
        F.col("keeper_id").alias(id_col)
    )
    return df.join(keepers, id_col, "left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _affine_params(num_perm: int, seed: int) -> list[tuple[int, int]]:
    # a, b < 2^30 and the base hash reduced to 32 bits keep a*h + b < 2^63
    # — no long overflow (Spark 4 ANSI mode would throw on wraparound)
    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 30), rng.randrange(0, 1 << 30))
        for _ in range(num_perm)
    ]


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    shingle_words: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<bigint>[num_perm]) minhash over word shingles.

    One base xxhash64 per shingle, then ``num_perm`` affine permutations
    folded with array_min — O(shingles + num_perm) per doc, all JVM-side.
    Docs with no shingle (shorter than the window) get an empty-doc
    sentinel signature so they never collide with real content.
    """
    params = _affine_params(num_perm, seed)
    shingles = F.array_distinct(word_ngrams(text_col, shingle_words))
    # reduce to 32 bits so the affine form a*h + b stays within long range
    base = F.transform(
        shingles, lambda s: F.xxhash64(s).bitwiseAND(F.lit(0xFFFFFFFF))
    )

    def perm_min(a: int, b: int) -> Column:
        return F.array_min(
            F.transform(base, lambda h: (h * a + b) % F.lit(_MERSENNE_P))
        )

    sig = F.array(
        *[
            # empty-doc sentinel, unique per perm slot
            F.coalesce(perm_min(a, b), F.lit(-(i + 1)))
            for i, (a, b) in enumerate(params)
        ]
    )
    return df.select(F.col(id_col).alias("id"), sig.alias("sig"))


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 16, rows_per_band: int | None = None
) -> DataFrame:
    """Candidate pairs (id_a < id_b) whose signatures collide in >= 1 band.

    Explode to (band_idx, band_hash, id), self-group per bucket. The join
    key (band_idx, band_hash) distributes buckets across the cluster; no
    all-pairs comparison ever materializes. At 100 TB the only hot spot is
    a degenerate bucket (identical boilerplate docs) — cap with a bucket-
    size limit upstream if needed.
    """
    num_perm = None  # inferred per-row via slice; bands*rows must cover sig
    sigs = signatures
    if rows_per_band is None:
        # infer from the first row's signature length
        num_perm = len(sigs.select("sig").first()["sig"])
        rows_per_band = max(1, num_perm // bands)
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.xxhash64(
                            F.array_join(
                                F.transform(
                                    F.slice(
                                        F.col("sig"), b * rows_per_band + 1, rows_per_band
                                    ),
                                    lambda v: v.cast("string"),
                                ),
                                ",",
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("id", "band.band_idx", "band.band_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_jaccard_estimate(
    pairs: DataFrame, signatures: DataFrame
) -> DataFrame:
    """Estimated Jaccard = fraction of matching signature positions."""
    sa = signatures.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = signatures.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(
                    F.filter(
                        F.zip_with(
                            "sig_a", "sig_b", lambda x, y: (x == y).cast("int")
                        ),
                        lambda m: m == 1,
                    )
                )
                / F.size(F.col("sig_a"))
            ).alias("est_jaccard"),
        )
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
    seed: int = 42,
) -> DataFrame:
    """End-to-end near-dup pipeline: signatures -> LSH candidates ->
    estimate filter. Returns (id_a, id_b, est_jaccard >= threshold)."""
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_words, seed)
    cands = lsh_candidate_pairs(sigs, bands, rows_per_band=num_perm // bands)
    est = minhash_jaccard_estimate(cands, sigs)
    return est.where(F.col("est_jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signature(text_col: str | Column, bits: int = 64) -> Column:
    """Classic SimHash: per-token 64-bit hash; each bit position
    accumulates +1/-1 by token bit; final bit = sign. Pure higher-order
    functions; one pass over tokens per document."""
    toks = tokens(text_col)
    hashes = F.transform(toks, lambda tok: F.xxhash64(tok))
    # bit positions are compile-time constants: unroll in Python so the
    # shift amounts are literals (the pyspark wrappers require ints)
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1)
                    .otherwise(-1)
                    .cast("long")
                    for j in range(bits)
                ]
            ),
            lambda a, d: a + d,
        ),
    )
    bit_values = F.zip_with(
        counts,
        # bit 63 must be the two's-complement negative value to fit a long
        F.array(
            *[
                F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long")
                for j in range(bits)
            ]
        ),
        lambda cnt, bitval: F.when(cnt > 0, bitval).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bit_values, F.lit(0).cast("long"), lambda acc, v: acc + v)


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Pairs within ``max_hamming`` bits, found by the pigeonhole banding:
    split the 64-bit signature into ``chunks`` 16-bit bands; any pair at
    distance <= chunks-1 must agree on at least one band, so candidate
    generation is an equi-join per band — never all-pairs."""
    width = 64 // chunks
    mask = (1 << width) - 1
    sigs = df.select(
        F.col(id_col).alias("id"), simhash_signature(text_col).alias("sim")
    )
    banded = sigs.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned("sim", i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("band"),
    ).select("id", "sim", "band.band_idx", "band.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.sim").bitwiseXOR(F.col("b.sim"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (verification / small-block dedup)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    n: int = 3,
    use_chars: bool = True,
) -> DataFrame:
    """Exact Jaccard over distinct n-grams for all pairs *within a block*
    (e.g. same source / length bucket). Blocking keeps the self-join from
    going quadratic globally; pick block_cols so blocks are O(thousands)."""
    grams = char_ngrams(text_col, n) if use_chars else word_ngrams(text_col, n)
    base = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("id"),
        F.array_distinct(grams).alias("grams"),
    )
    a, b = base.alias("a"), base.alias("b")
    cond = (F.col("a.id") < F.col("b.id"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    return a.join(b, cond).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.when(union > 0, inter / union).otherwise(F.lit(0.0)).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Cosine-similar pairs above threshold, blocked by random-hyperplane
    LSH: vectors agreeing on all ``planes`` sign bits land in one bucket;
    near-identical vectors almost surely share a bucket. Exact cosine is
    then computed only within buckets."""
    from youtube_trending_data_pipeline_spark.operators.similarity import (
        hyperplane_signature,
    )

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        hyperplane_signature(F.col(vec_col), planes=planes, seed=seed).alias("bucket"),
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_similarity(F.col("a.vec"), F.col("b.vec")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
