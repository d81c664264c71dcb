"""Empty-input resilience: a 100 TB pipeline routinely sees empty
partitions, empty date slices, and filters that match nothing. Core
operators must return empty results with the right schema — not crash,
not return nulls.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )


def _empty_events(spark):
    return spark.createDataFrame(
        [],
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )


def test_dedup_operators_on_empty_corpus(spark):
    from youtube_trending_data_pipeline_spark.operators import dedup as dd

    docs = _empty_docs(spark)
    assert dd.exact_duplicates(docs, "doc_id", "text").count() == 0
    sigs = dd.minhash_signatures(docs, "doc_id", "text", num_perm=16)
    assert sigs.count() == 0
    pairs = dd.lsh_candidate_pairs(sigs, num_perm=16)
    assert pairs.count() == 0


def test_sessionize_and_topk_on_empty_events(spark):
    from youtube_trending_data_pipeline_spark.operators.sessions import sessionize
    from youtube_trending_data_pipeline_spark.operators.topk import top_k_per_group

    ev = _empty_events(spark)
    out = sessionize(ev, "user_id", "ts", gap=1000)
    assert out.count() == 0 and "session_id" in out.columns
    tk = top_k_per_group(
        ev.select("user_id", "event_id", "value"),
        ["user_id"],
        [F.desc("value")],
        k=3,
    )
    assert tk.count() == 0


def test_similarity_on_empty_corpus(spark):
    from youtube_trending_data_pipeline_spark.operators import similarity as sim

    emb_schema = "vec_id long, embedding array<float>, label int"
    corpus = spark.createDataFrame([], emb_schema)
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0], 0)], emb_schema
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    assert sim.brute_force_topk(corpus, queries, k=3).count() == 0
    assert sim.lsh_topk(corpus, queries, k=3).count() == 0
    assert sim.quantize_int8(corpus).count() == 0


def test_pagerank_on_empty_edges(spark):
    from youtube_trending_data_pipeline_spark.operators.graph import (
        pagerank_integer,
    )

    edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank_integer(edges, iterations=2, checkpoint=False).count() == 0


def test_bm25_on_empty_corpus(spark):
    from youtube_trending_data_pipeline_spark.operators.retrieval import (
        bm25_scores,
    )

    out = bm25_scores(_empty_docs(spark), ["join"], log_idf=False)
    assert out.count() == 0
    assert set(out.columns) == {"doc_id", "dl", "tf_join", "bm25"}


def test_gram_and_pca_on_empty_corpus(spark):
    from youtube_trending_data_pipeline_spark.operators import similarity as sim

    corpus = spark.createDataFrame([], "vec_id long, embedding array<float>")
    # no vectors -> no partial Grams -> zero cells (not a crash)
    assert sim.gram_matrix(corpus).count() == 0


def test_channels_fetch_on_empty_ids(spark):
    from youtube_trending_data_pipeline_spark.sources.fetchers import (
        channels_from_fetcher,
    )

    class Boom:
        def fetch_channels(self, ids):
            raise AssertionError("must not be called for zero ids")

    ids = spark.createDataFrame([], "channel_id string")
    assert channels_from_fetcher(ids, Boom()).count() == 0


def test_hits_on_empty_edges(spark):
    from youtube_trending_data_pipeline_spark.operators.graph import hits_integer

    edges = spark.createDataFrame([], "src long, dst long")
    out = hits_integer(edges, iterations=2)
    assert out.count() == 0
    assert out.columns == ["node", "kind", "score"]


def test_round6_operators_on_empty_inputs(spark):
    """PQ encode, the multimodal round-6 kernels, and the bloom/BLEU
    frames must all return empty with the right schema on empty input."""
    from youtube_trending_data_pipeline_spark.operators.multimodal import (
        audio_silence_trim,
        detect_scene_cuts,
        image_gray_histogram,
    )
    from youtube_trending_data_pipeline_spark.operators.similarity import (
        pq_encode,
    )

    empty_vecs = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    pq = pq_encode(empty_vecs)
    assert pq.count() == 0
    assert pq.columns == ["vec_id", "sub", "code", "dist_q"]

    empty_media = spark.createDataFrame(
        [], "asset_id string, media_type string, content binary"
    )
    assert detect_scene_cuts(empty_media).count() == 0
    assert image_gray_histogram(empty_media).count() == 0
    assert audio_silence_trim(empty_media).count() == 0


def test_peels_on_empty_edges(spark):
    """kcore_peel / ktruss_peel on an empty edge list: empty result,
    right schema, no crash across all fixed rounds."""
    from youtube_trending_data_pipeline_spark.operators.graph import (
        kcore_peel,
        ktruss_peel,
    )

    edges = spark.createDataFrame([], "src long, dst long")
    kc = kcore_peel(edges, k=3, rounds=4)
    assert kc.columns == ["node", "core_deg"] and kc.count() == 0
    kt = ktruss_peel(edges, k=3, rounds=3)
    assert kt.columns == ["src", "dst", "support"] and kt.count() == 0


def test_mutual_knn_entries_on_empty_embeddings(spark, tmp_path):
    """The bucketed mutual-kNN build (and its exact audit baseline) must
    return empty frames with the right schema when the embedding corpus
    is empty — pivot seeding, cell ranking, the Arrow kernels, the peel
    rounds, and the three 1-row audit aggregates all see zero rows."""
    from youtube_trending_data_pipeline_spark.catalog import (
        QUERIES,
        _load_extensions,
    )

    _load_extensions()
    d = str(tmp_path)
    spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label string"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    kcore = QUERIES["graph_kcore_mutual_knn"].fn(spark, d)
    assert kcore.count() == 0
    assert set(kcore.columns) == {"node", "core_deg"}
    truss = QUERIES["graph_ktruss_mutual_knn"].fn(spark, d)
    assert truss.count() == 0
    rows = QUERIES["graph_mutual_knn_recall_audit"].fn(spark, d).collect()
    assert len(rows) == 1  # the audit row survives with zero counts
    assert rows[0]["exact_edges"] == 0
    assert rows[0]["bucketed_edges"] == 0
    assert rows[0]["recall_ppm"] == 0


def test_round9_operators_on_empty_inputs(spark, tmp_path):
    """Round-9 entries on empty tables: compaction/vacuum/rate-limit
    produce zero rows; the bloom audit's single summary row survives
    with zero counts; late interaction retrieves nothing."""
    from youtube_trending_data_pipeline_spark.catalog import (
        QUERIES,
        _load_extensions,
    )

    _load_extensions()
    d = str(tmp_path)
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    spark.createDataFrame(
        [], "p_partkey long, p_size long"
    ).write.mode("overwrite").parquet(f"{d}/part.parquet")
    spark.createDataFrame(
        [], "l_partkey long"
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")

    assert QUERIES["maintenance_compaction_plan"].fn(spark, d).count() == 0
    assert QUERIES["sim_late_interaction_topk"].fn(spark, d).count() == 0
    assert QUERIES["retention_vacuum_plan"].fn(spark, d).count() == 0
    assert QUERIES["stream_rate_limit_audit"].fn(spark, d).count() == 0
    r = QUERIES["join_bloom_prefilter_audit"].fn(spark, d).collect()
    assert len(r) == 1
    assert r[0]["build_keys"] == 0 and r[0]["bloom_pass_rows"] == 0


def test_round10_operators_on_empty_inputs(spark, tmp_path):
    """Round-10 second-session entries on empty tables: the residual
    IVFADC / audio fingerprint / spans / FFD / pair audit all produce
    zero rows without crashing; the minhash recall audit's single
    summary row survives with zero counts and guarded ppm divisions;
    the leakage-free split is empty over an empty corpus."""
    from youtube_trending_data_pipeline_spark.catalog import (
        QUERIES,
        _load_extensions,
    )

    _load_extensions()
    d = str(tmp_path)
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    for name in [
        "sim_ivfadc_residual_topk",
        "dedup_substring_spans",
        "multimodal_audio_fingerprint_dedup",
        "pack_sequences_ffd",
        "split_leakage_free_components",
        "multimodal_pair_dedup_audit",
    ]:
        assert QUERIES[name].fn(spark, d).count() == 0, name
    r = QUERIES["dedup_minhash_recall_audit"].fn(spark, d).collect()
    assert len(r) == 1
    assert (r[0]["n_exact"], r[0]["n_lsh"], r[0]["n_common"]) == (0, 0, 0)
    assert r[0]["recall_ppm"] == 0 and r[0]["precision_ppm"] == 0
    # sampled form: COUNT(*)=0 saturates the keep threshold (GREATEST
    # guard, no ANSI div-by-zero), the empty corpus samples nothing,
    # and the one-row contract holds
    r2 = QUERIES["dedup_minhash_recall_audit_sampled"].fn(spark, d).collect()
    assert len(r2) == 1
    assert (
        r2[0]["n_sampled_docs"], r2[0]["n_exact"], r2[0]["n_lsh"],
        r2[0]["n_common"],
    ) == (0, 0, 0, 0)


def test_spans_apply_on_empty_input(spark, tmp_path):
    """The apply entry keeps its one-row-per-doc contract vacuously on
    an empty corpus (zero rows, no crash)."""
    from youtube_trending_data_pipeline_spark.catalog import (
        QUERIES,
        _load_extensions,
    )

    _load_extensions()
    d = str(tmp_path)
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    assert QUERIES["dedup_substring_spans_apply"].fn(spark, d).count() == 0
