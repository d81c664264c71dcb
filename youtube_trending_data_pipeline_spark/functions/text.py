"""Text-analysis column functions for the training-data pipeline surface.

All pure JVM column expressions (split / transform / aggregate /
higher-order functions) — no Python UDFs — so they run inside whole-stage
codegen and scale linearly with input partitions. Each has an exact ANSI
SQL mirror used by the DuckDB oracle (catalog.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic per-language marker lists for the n-gram/stopword language
# heuristic. Real deployments would swap in fastText/CLD3 via a pandas UDF;
# the heuristic keeps the operator SQL-checkable and dependency-free.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "slow"),
    "es": ("data", "query", "stream", "row"),
    "de": ("agg", "hash", "vector", "sort"),
    "fr": ("window", "order", "small", "line"),
    "zh": ("merge", "batch", "big", "join"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "to", "and", "in", "is", "it")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization -> array<string> (empty tokens dropped)."""
    return F.filter(F.split(_c(text), r"\s+"), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    """Whitespace token count (BIGINT)."""
    return F.size(tokens(text)).cast("long")


def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """All character n-grams of the string (with duplicates), JVM-side:
    transform over an index sequence + substring — no Python per row.
    (Guarded: Spark's sequence(1, 0) is *descending*, not empty.)"""
    c = _c(text)
    return F.when(
        F.length(c) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(c) - (n - 1)),
            lambda i: F.substring(c, i, n),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams(text: Column | str, n: int = 3) -> Column:
    """Word n-gram strings (space-joined) for shingle-based dedup."""
    toks = tokens(text)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def stopword_ratio(text: Column | str) -> Column:
    """Fraction of tokens that are stopwords; 0.0 for empty docs."""
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are not [a-zA-Z0-9 ]; 0.0 for empty."""
    c = _c(text)
    stripped = F.length(F.regexp_replace(c, r"[^a-zA-Z0-9 ]", ""))
    return F.when(
        F.length(c) > 0, (F.length(c) - stripped) / F.length(c)
    ).otherwise(F.lit(0.0))


def mean_token_length(text: Column | str) -> Column:
    """Average token length in characters; 0.0 for empty docs."""
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t).cast("long")
    )
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-hit count per language (deterministic heuristic)."""
    toks = tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column | str) -> Column:
    """argmax-score language with deterministic tie-break (score DESC,
    language code ASC) — mirrors the oracle's greatest-score CASE chain."""
    scores = lang_scores(text)
    # build: pick lang with max score; ties -> lexicographically first lang
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.aggregate(
        pairs,
        F.struct(
            F.lit(-1).cast("long").alias("score"), F.lit("und").alias("lang")
        ),
        lambda acc, p: F.when(p["score"] > acc["score"], p).otherwise(acc),
    )
    return best["lang"]


def fingerprint(text: Column | str) -> Column:
    """Normalized-content fingerprint: md5 of lowercased, whitespace-
    collapsed text. Identical in DuckDB: md5(lower(regexp_replace(...)))."""
    norm = F.regexp_replace(F.lower(F.trim(_c(text))), r"\s+", " ")
    return F.md5(norm)
