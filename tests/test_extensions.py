"""Behavioral tests for the training-data extension operators: planted
near-duplicates must be found, LSH recall vs brute force must be high,
multimodal plumbing must round-trip Arrow batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from youtube_trending_data_pipeline_spark.operators import dedup as dd
from youtube_trending_data_pipeline_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    """documents table + planted exact and near duplicates."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = docs.limit(10).collect()
    extra = []
    for i, row in enumerate(base):
        # exact copy (new id)
        extra.append((10_000 + i, row["text"], row["lang"], row["source"], row["n_chars"]))
        # near copy: append two words (high word-shingle overlap)
        extra.append(
            (20_000 + i, row["text"] + " spark extra", row["lang"], row["source"], row["n_chars"])
        )
    extra_df = spark.createDataFrame(
        extra, "doc_id long, text string, lang string, source string, n_chars long"
    )
    return docs.unionByName(extra_df)


def test_exact_dedup_finds_planted_copies(spark, docs_with_dups):
    groups = dd.exact_duplicates(docs_with_dups, "doc_id", "text")
    dups = groups.where(F.col("n_copies") > 1)
    assert dups.count() == 10  # the 10 planted exact copies
    # keeper is the min id (the original)
    assert dups.where(F.col("keeper_id") >= 10_000).count() == 0
    kept = dd.drop_exact_duplicates(docs_with_dups, "doc_id", "text")
    assert kept.count() == docs_with_dups.count() - 10


def test_minhash_lsh_finds_planted_near_dups(spark, docs_with_dups):
    found = dd.minhash_near_duplicates(
        docs_with_dups, "doc_id", "text", threshold=0.5
    )
    pairs = {(r["id_a"], r["id_b"]) for r in found.collect()}
    # exact copies estimate jaccard 1.0; near copies high overlap
    exact_found = sum(1 for i in range(10) if any(p for p in pairs if 10_000 + i in p))
    near_found = sum(1 for i in range(10) if any(p for p in pairs if 20_000 + i in p))
    assert exact_found == 10
    assert near_found >= 8  # LSH is probabilistic; banding should catch most


def test_minhash_estimate_accuracy(spark, docs_with_dups):
    sigs = dd.minhash_signatures(docs_with_dups, "doc_id", "text")
    cands = spark.createDataFrame(
        [(i, 10_000 + i) for i in range(10)], "id_a long, id_b long"
    )
    est = dd.minhash_jaccard_estimate(cands, sigs)
    # identical docs -> every signature position matches
    assert all(r["est_jaccard"] == 1.0 for r in est.collect())


def test_simhash_exact_and_near(spark, docs_with_dups):
    found = dd.simhash_near_duplicates(
        docs_with_dups, "doc_id", "text", max_hamming=16
    )
    rows = {(r["id_a"], r["id_b"]): r["hamming"] for r in found.collect()}
    # identical docs -> identical signature -> hamming 0
    for i in range(10):
        assert rows.get((i, 10_000 + i)) == 0
    # near copies -> small hamming distance
    near_hits = [h for (a, b), h in rows.items() if b >= 20_000 and a == b - 20_000]
    assert len(near_hits) >= 8


def test_ngram_jaccard_pairs(spark, docs_with_dups):
    out = dd.ngram_jaccard_pairs(
        docs_with_dups, "doc_id", "text", ["source"], n=3
    ).where(F.col("jaccard") >= 0.9)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    for i in range(10):
        assert any(10_000 + i in p for p in pairs)


def test_ngram_jaccard_skewed_block_guard(spark, docs_with_dups):
    """VERDICT r4 #6: a block exceeding max_block_rows must fail the job
    loudly (the within-block quadratic would otherwise silently explode),
    while well-blocked input under the cap is unaffected."""
    import pytest
    from py4j.protocol import Py4JJavaError

    skewed = docs_with_dups.withColumn("blk", F.lit("one-giant-block"))
    guarded = dd.ngram_jaccard_pairs(
        skewed, "doc_id", "text", ["blk"], n=3, max_block_rows=10
    )
    with pytest.raises(Exception) as exc:
        guarded.count()
    assert "max_block_rows" in str(exc.value)

    ok = dd.ngram_jaccard_pairs(
        skewed, "doc_id", "text", ["blk"], n=3,
        max_block_rows=docs_with_dups.count() + 1,
    )
    assert ok.count() > 0
    # opt-out still available for corpora with trusted blocking
    unguarded = dd.ngram_jaccard_pairs(
        skewed, "doc_id", "text", ["blk"], n=3, max_block_rows=None
    )
    assert unguarded.count() == ok.count()


def test_lsh_topk_recall_vs_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.where(F.col("vec_id") >= 10)
    exact = sim.brute_force_topk(corpus, queries, k=5)
    approx = sim.lsh_topk(corpus, queries, k=5, planes=4, tables=8)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_ivf_topk_recall_vs_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.where(F.col("vec_id") >= 10)
    exact = sim.brute_force_topk(corpus, queries, k=5)
    approx = sim.ivf_topk(corpus, queries, k=5, n_clusters=8, n_probe=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_embedding_near_dup_with_planted_vector(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # plant a copy of vec 0 with id 9000 — cosine 1.0, same LSH bucket
    v0 = emb.where(F.col("vec_id") == 0).select(
        F.lit(9000).cast("long").alias("vec_id"), "embedding", "label"
    )
    planted = emb.unionByName(v0)
    found = dd.embedding_near_duplicates(
        planted, "vec_id", "embedding", threshold=0.999
    )
    pairs = {(r["id_a"], r["id_b"]) for r in found.collect()}
    assert (0, 9000) in pairs


def test_multimodal_batch_plumbing(spark):
    from youtube_trending_data_pipeline_spark.operators.multimodal import (
        extract_image_features,
        sample_video_frames,
    )

    media = spark.createDataFrame(
        [
            ("a1", "image", b"\x89PNGfake", None, None, None, None, None),
            ("a2", "image", b"\xff\xd8JPGfake", None, None, None, None, None),
            ("v1", "video", b"", None, None, None, 3500, "h264"),
        ],
        "asset_id string, media_type string, content binary, uri string, "
        "width int, height int, duration_ms long, codec string",
    )
    feats = extract_image_features(media)
    rows = {r["asset_id"]: r for r in feats.collect()}
    assert set(rows) == {"a1", "a2"}  # video filtered out JVM-side
    assert len(rows["a1"]["feature"]) == 8
    assert rows["a1"]["n_bytes"] == 8
    # determinism
    again = {r["asset_id"]: r for r in extract_image_features(media).collect()}
    assert again["a1"]["feature"] == rows["a1"]["feature"]

    frames = sample_video_frames(media, every_ms=1000)
    ts = [r["frame_ts_ms"] for r in frames.collect()]
    assert ts == [0, 1000, 2000, 3000]


def test_label_centroids_shape(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = sim.label_centroids(emb)
    n_labels = emb.select("label").distinct().count()
    assert cents.count() == n_labels * 64


def test_lsh_bucket_cap_bounds_candidates(spark, docs_with_dups):
    """VERDICT r1 #3: a planted boilerplate mega-cluster must not go
    quadratic when the bucket cap is on, the drop must be observable, and
    planted near-dup recall outside the hot bucket must be unchanged."""
    from pyspark.sql import Observation

    boiler = spark.createDataFrame(
        [
            (50_000 + i, "common boilerplate sentence that appears on every page")
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    docs = docs_with_dups.select("doc_id", "text").unionByName(boiler)
    sigs = dd.minhash_signatures(docs, "doc_id", "text").localCheckpoint(
        eager=False
    )
    uncapped = dd.lsh_candidate_pairs(sigs, 64).collect()
    obs = Observation("cap_test")
    capped = dd.lsh_candidate_pairs(
        sigs, 64, max_bucket=10, observation=obs
    ).collect()

    boiler_unc = {(r["id_a"], r["id_b"]) for r in uncapped if r["id_a"] >= 50_000}
    boiler_cap = {(r["id_a"], r["id_b"]) for r in capped if r["id_a"] >= 50_000}
    assert len(boiler_unc) == 40 * 39 // 2  # quadratic without the cap
    assert len(boiler_cap) == 0  # hot bucket dropped entirely
    # 40 identical docs x 16 bands of hot-bucket rows were dropped
    assert obs.get["dropped_rows"] >= 40 * 16
    # recall outside the hot bucket is untouched
    rest_unc = {(r["id_a"], r["id_b"]) for r in uncapped if r["id_b"] < 50_000}
    rest_cap = {(r["id_a"], r["id_b"]) for r in capped if r["id_b"] < 50_000}
    assert rest_unc == rest_cap


def test_ppm_decode_hand_computed_fixture(spark):
    """VERDICT r1 #7: the image decode must be real. A hand-written 2x1
    P6 image (red pixel, green pixel) must produce exactly the pixel
    statistics computed by hand — header comments included."""
    from youtube_trending_data_pipeline_spark.operators.multimodal import (
        decode_ppm,
        extract_image_features,
        pixel_features,
    )

    ppm = b"P6\n# a comment\n2 1\n255\n" + bytes([255, 0, 0, 0, 255, 0])
    w, h, rgb = decode_ppm(ppm)
    assert (w, h) == (2, 1)
    assert rgb == bytes([255, 0, 0, 0, 255, 0])
    feats = pixel_features(w, h, rgb)
    # hand-computed: mean_r = 255/(255*2) = 0.5; mean_g = 0.5; mean_b = 0;
    # mean_all = 510/(255*6) = 1/3; min 0; max 1
    assert feats == [2.0, 1.0, 0.5, 0.5, 0.0, 510 / 1530.0, 0.0, 1.0]

    # end-to-end through the Arrow kernel
    media = spark.createDataFrame(
        [("p1", "image", ppm, None, None, None, None, None)],
        "asset_id string, media_type string, content binary, uri string, "
        "width int, height int, duration_ms long, codec string",
    )
    row = extract_image_features(media).collect()[0]
    assert row["n_bytes"] == len(ppm)
    assert list(row["feature"]) == feats


def test_bmp_decode_hand_computed_fixture():
    """Hand-assembled 2x2 uncompressed 24-bit BMP (bottom-up rows, BGR,
    4-byte row padding) decodes to the exact RGB pixel grid."""
    import struct

    from youtube_trending_data_pipeline_spark.operators.multimodal import (
        decode_bmp,
        pixel_features,
    )

    # pixels top-down RGB: (10,20,30) (40,50,60) / (70,80,90) (100,110,120)
    # BMP stores bottom-up BGR with rows padded to 4 bytes (2*3=6 -> 8)
    row_bottom = bytes([90, 80, 70, 120, 110, 100]) + b"\x00\x00"
    row_top = bytes([30, 20, 10, 60, 50, 40]) + b"\x00\x00"
    pixel_data = row_bottom + row_top
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pixel_data), 0, 0, 14 + 40)
    bmp = header + dib + pixel_data
    w, h, rgb = decode_bmp(bmp)
    assert (w, h) == (2, 2)
    assert rgb == bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    feats = pixel_features(w, h, rgb)
    assert feats[2] == (10 + 40 + 70 + 100) / (255.0 * 4)  # mean_r
    assert feats[6] == 10 / 255.0 and feats[7] == 120 / 255.0


def test_wav_decode_hand_computed_fixture(spark):
    """Hand-assembled RIFF/WAVE (16-bit mono PCM, LIST chunk before data
    to exercise the chunk walker) decodes to the exact samples, and the
    Arrow kernel reproduces the hand-computed features."""
    import struct

    from youtube_trending_data_pipeline_spark.operators.multimodal import (
        audio_features,
        decode_wav,
        extract_audio_features,
    )

    samples = [1000, -2000, 3000, -4000]
    data = struct.pack("<4h", *samples)
    list_chunk = b"LIST" + struct.pack("<I", 4) + b"INFO"
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 24 + 12 + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        + list_chunk
        + b"data" + struct.pack("<I", len(data)) + data
    )
    sr, got = decode_wav(wav)
    assert sr == 8000 and got == samples
    feats = audio_features(sr, got, len(wav))
    # hand-computed: sum|s| = 10000, peak 4000, 3 sign flips, 4 samples
    # at 8 kHz -> 0 ms (truncated)
    assert feats == [8000, 4, 0, 10000 / (32768.0 * 4), 4000 / 32768.0, 3]

    media = spark.createDataFrame(
        [("a1", "audio", wav)],
        "asset_id string, media_type string, content binary",
    )
    row = extract_audio_features(media).collect()[0]
    assert row["n_bytes"] == len(wav)
    assert row["sample_rate"] == 8000 and row["n_samples"] == 4
    assert row["mean_abs"] == feats[3] and row["peak"] == feats[4]
    assert row["zero_crossings"] == 3


def test_y4m_decode_hand_computed_fixture(spark):
    """Hand-assembled 2-frame 2x2 YUV4MPEG2 clip at 10 fps: the parser
    must return the exact luma planes, and sampling every 100 ms must
    pick frame 0 at t=0 and frame 1 at t=100 with hand-computed stats."""
    from youtube_trending_data_pipeline_spark.operators.multimodal import (
        decode_y4m,
        extract_video_frame_features,
    )

    f0_y, f0_uv = bytes([10, 20, 30, 40]), bytes([128, 128])
    f1_y, f1_uv = bytes([50, 60, 70, 80]), bytes([0, 255])
    y4m = (
        b"YUV4MPEG2 W2 H2 F10:1 Ip A1:1 C420\n"
        + b"FRAME\n" + f0_y + f0_uv
        + b"FRAME\n" + f1_y + f1_uv
    )
    w, h, num, den, frames = decode_y4m(y4m)
    assert (w, h, num, den) == (2, 2, 10, 1)
    assert frames == [f0_y, f1_y]

    media = spark.createDataFrame(
        [("v1", "video", y4m)],
        "asset_id string, media_type string, content binary",
    )
    rows = sorted(
        extract_video_frame_features(media, every_ms=100).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [(r["frame_idx"], r["frame_ts_ms"]) for r in rows] == [(0, 0), (1, 100)]
    assert rows[0]["mean_y"] == (10 + 20 + 30 + 40) / (255.0 * 4)
    assert rows[0]["min_y"] == 10 / 255.0 and rows[0]["max_y"] == 40 / 255.0
    assert rows[1]["mean_y"] == (50 + 60 + 70 + 80) / (255.0 * 4)


def test_multimodal_uri_fetch_seam(spark):
    """URI-only assets (content NULL) must resolve through the injected
    object-store fetcher inside the Arrow kernel — and without a fetcher
    the kernel must fail loudly, not silently skip the asset."""
    import pytest as _pytest

    from youtube_trending_data_pipeline_spark.operators.multimodal import (
        extract_image_features,
    )

    ppm = b"P6\n2 1\n255\n" + bytes([255, 0, 0, 0, 255, 0])
    store = {"mem://assets/p1.ppm": ppm}
    media = spark.createDataFrame(
        [("p1", "image", None, "mem://assets/p1.ppm")],
        "asset_id string, media_type string, content binary, uri string",
    )
    row = extract_image_features(media, fetch=store.__getitem__).collect()[0]
    assert row["n_bytes"] == len(ppm)
    assert list(row["feature"])[:4] == [2.0, 1.0, 0.5, 0.5]

    with _pytest.raises(Exception, match="fetcher|NotImplemented"):
        extract_image_features(media).collect()


def test_bm25_log_and_odds_idf_rank_identically(spark, sf_dir):
    """The oracle-checked catalog entry uses the log-free RSJ odds idf
    (ln() is not bit-identical across engines); the standard ln-idf BM25
    must produce the same top-20 ranking on the documents corpus."""
    from youtube_trending_data_pipeline_spark.operators.retrieval import (
        bm25_scores,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    top = lambda df, k: [
        r["doc_id"]
        for r in df.orderBy(F.desc("bm25"), "doc_id").limit(k).collect()
    ]
    # single-term: odds is a monotone transform of ln-idf, so the ranking
    # is EXACTLY the same — this is the property that justifies shipping
    # the log-free variant in the oracle gate
    for term in ["join", "vector"]:
        exact = top(bm25_scores(docs, [term], log_idf=True), 20)
        odds = top(bm25_scores(docs, [term], log_idf=False), 20)
        assert exact == odds, term
    # multi-term: per-term idf scalars differ, so orderings may diverge in
    # the tail — require strong head agreement, not identity
    terms = ["join", "vector", "stream"]
    with_log = top(bm25_scores(docs, terms, log_idf=True), 20)
    with_odds = top(bm25_scores(docs, terms, log_idf=False), 20)
    assert len(set(with_log) & set(with_odds)) >= 12


def test_pagerank_integer_hand_computed(spark):
    """One round of integer PageRank on a 3-node graph must produce the
    exact hand-computed integer ranks (and the dangling node must leak
    rank, per the documented simplification)."""
    from youtube_trending_data_pipeline_spark.operators.graph import (
        SCALE,
        pagerank_integer,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3)], "src long, dst long"
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank_integer(edges, iterations=1, checkpoint=False).collect()
    }
    base = 15 * SCALE // 100
    # node 1 receives all of node 2's rank; nodes 2 and 3 half of node 1's
    assert got[1] == base + (85 * SCALE) // 100
    assert got[2] == base + (85 * (SCALE // 2)) // 100
    assert got[3] == got[2]
    # node 3 is dangling: total rank leaks below 3*SCALE
    assert sum(got.values()) < 3 * SCALE


def test_star_components_chain_converges_logarithmically(spark):
    """Large-star/small-star must collapse a 64-node chain (diameter 63)
    within ~log2 rounds — max_iter=8 would fail for a diameter-bound
    algorithm — and must agree with min-label propagation."""
    from youtube_trending_data_pipeline_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src long, dst long"
    )
    comp = connected_components_star(chain, max_iter=8).collect()
    assert len(comp) == 64
    assert all(r["component"] == 0 for r in comp)

    # two clusters + agreement with the min-label implementation
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)], "src long, dst long"
    )
    star = {(r["node"], r["component"])
            for r in connected_components_star(edges).collect()}
    label = {(r["node"], r["component"])
             for r in connected_components(edges).collect()}
    assert star == label == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10)}


def test_min_label_components_raise_on_nonconvergence(spark):
    """Round-12 ADVICE fix: min-label propagation must RAISE when the
    graph diameter exceeds its round budget, never return silently
    unconverged (wrong) labels — a 20-node chain needs 19 rounds, so
    max_iter=4 must fail loudly while max_iter=25 still converges."""
    import pytest

    from youtube_trending_data_pipeline_spark.operators.components import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(19)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=4)
    ok = connected_components(chain, max_iter=25).collect()
    assert len(ok) == 20 and all(r["component"] == 0 for r in ok)


def test_default_driver_mem_sizing(monkeypatch):
    """Round-12 ADVICE fix: the 24g local heap only applies on big boxes;
    the env var always wins; small machines keep the old 8g."""
    from youtube_trending_data_pipeline_spark import session as s

    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "13g")
    assert s._default_driver_mem() == "13g"

    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)
    gib = 1024**3
    page = 4096
    monkeypatch.setattr(
        s.os, "sysconf",
        lambda name: (128 * gib // page) if name == "SC_PHYS_PAGES" else page,
    )
    assert s._default_driver_mem() == "24g"
    monkeypatch.setattr(
        s.os, "sysconf",
        lambda name: (16 * gib // page) if name == "SC_PHYS_PAGES" else page,
    )
    assert s._default_driver_mem() == "8g"


def test_ivf_knobs_schedule():
    """Round 10 (VERDICT r9 #4): the IVF retrieval knobs are
    corpus-relative with floors that reproduce the retired fixed
    (8, 3, 8) at every gate SF, and the probe count holds its
    gate-scale ratio to sqrt(cells) past the floor."""
    import math

    from youtube_trending_data_pipeline_spark.operators.similarity import (
        ivf_knobs,
        pq_codebook_size,
    )

    # every gate SF sits at the floor (<= 2000 corpus vectors)
    for n in (15, 195, 1995, 2000):
        assert ivf_knobs(n) == (8, 3)
        assert pq_codebook_size(n) == 8
    # 10x replica: 19995 corpus vectors -> 79 cells, probe ~ sqrt
    cells, probe = ivf_knobs(19_995)
    assert cells == 79
    assert probe == math.ceil(math.sqrt(9 * 79 / 8))
    assert pq_codebook_size(19_995) == 79
    # monotone, and the codebook caps at 256 (8-bit PQ) while cells
    # keep growing with the corpus
    cells_big, probe_big = ivf_knobs(1_000_000)
    assert cells_big == 4000 and probe_big == math.ceil(
        math.sqrt(9 * 4000 / 8)
    )
    assert pq_codebook_size(1_000_000) == 256


def test_assign_pivot_cells_negative_ids(spark):
    """The new salt-group assignment kernels use pmod (ADVICE r9): a
    negative vector id must still land in a seeded salt group and get
    assigned, and ranking must be (integer dot DESC, seed id ASC)."""
    from pyspark.sql import functions as F

    from youtube_trending_data_pipeline_spark.operators.similarity import (
        assign_pivot_cells,
    )

    df = spark.createDataFrame(
        [(-9, [1.0, 0.0]), (-1, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    seeds = spark.createDataFrame(
        [(10, [1.0, 0.0]), (20, [0.0, 1.0])],
        "seed_id long, seed_vec array<float>",
    )
    out = {
        r["vec_id"]: (r["cell"], r["cell_rank"])
        for r in assign_pivot_cells(df, seeds, 1).collect()
    }
    assert out == {-9: (10, 1), -1: (20, 1), 3: (10, 1)}
    # 3 ties both seeds at dot 10000 -> smaller seed id wins
    ranks = {
        (r["vec_id"], r["cell_rank"]): r["cell"]
        for r in assign_pivot_cells(df, seeds, 2).collect()
    }
    assert ranks[(3, 1)] == 10 and ranks[(3, 2)] == 20
