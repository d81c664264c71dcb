"""Behavioral tests for the round-5 curation batch 2 operators
(catalog_curation.py): the semantic claims the oracle parity sweep
cannot express — CDC shift-robustness, EWMA fold order-dependence,
weighted-sampling inclusion bias, keyword-tag zero-hit handling."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from youtube_trending_data_pipeline_spark.catalog import QUERIES, _load_extensions

_load_extensions()

SF = "/root/testdata/sf0.001"


def _chunks_for(spark, text: str):
    """Run the cdc chunking stages on one in-memory doc; return the
    ordered chunk strings."""
    from youtube_trending_data_pipeline_spark import catalog_curation as cc

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    pos = df.select("doc_id", F.posexplode(toks).alias("pos0", "tok")).select(
        "doc_id", "tok", (F.col("pos0") + 1).alias("pos")
    )
    marked = pos.withColumn(
        "b",
        F.expr("CASE WHEN " + cc._GATE_SQL.format(tok="tok") + " THEN 1 ELSE 0 END"),
    )
    rows = sorted(marked.collect(), key=lambda r: r.pos)
    chunks, cur = [], []
    for r in rows:
        cur.append(r.tok)
        if r.b == 1:
            chunks.append(" ".join(cur))
            cur = []
    if cur:
        chunks.append(" ".join(cur))
    return chunks


def test_cdc_boundaries_survive_prefix_insertion(spark):
    """The shift-robustness claim: inserting ONE token at the head of a
    document must leave every chunk after the first boundary identical
    (fixed-width passages would all shift by one)."""
    base = "key agg row scan slow fast table value part hash merge batch " * 4
    a = _chunks_for(spark, base.strip())
    b = _chunks_for(spark, ("inserted " + base).strip())
    assert len(a) >= 3, "gate too sparse for the test corpus"
    # all chunks after the first boundary are content-addressed: identical
    assert a[1:] == b[1:][-len(a[1:]):]
    # and the tail chunks literally match as sets minus the head chunk
    assert set(a[1:]) <= set(b)


def test_ewma_fold_is_order_dependent(spark):
    """The integer EWMA recurrence must weight recent events more: the
    same multiset of values in opposite orders yields different folds
    (this is why no commutative aggregate can express it)."""
    def fold(vals):
        e = None
        for v in vals:
            e = v if e is None else (e + v) // 2
        return e

    asc = fold([100, 200, 400])
    desc = fold([400, 200, 100])
    assert asc != desc
    # final value dominated by the last observation
    assert abs(asc - 400) < abs(asc - 100)


def test_ewma_catalog_matches_local_fold(spark):
    """Spark applyInPandas fold == the plain-Python recurrence on the
    same ordered per-user values."""
    out = {
        r.user_id: (r.n_events, r.ewma_c)
        for r in QUERIES["ewma_user_value"].fn(spark, SF).collect()
    }
    ev = (
        QUERIES["ewma_user_value"]
        .fn.__globals__["t"](spark, SF, "events")
        .select(
            "user_id",
            "event_id",
            F.expr("ts div 1000").alias("ts_us"),
            F.round(F.col("value") * 100).cast("long").alias("v"),
        )
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts_us, r.event_id, r.v))
    for uid, rows in by_user.items():
        rows.sort()
        e = None
        for _, _, v in rows:
            e = v if e is None else (e + v) // 2
        assert out[uid] == (len(rows), e), uid


def test_weighted_sample_prefers_heavy_docs(spark):
    """Priority sampling must select long documents at a higher rate
    than uniform: the mean n_chars of the sample exceeds the corpus
    mean."""
    sample = QUERIES["sample_weighted_topk"].fn(spark, SF).toPandas()
    corpus = (
        QUERIES["sample_weighted_topk"]
        .fn.__globals__["t"](spark, SF, "documents")
        .select("n_chars")
        .toPandas()
    )
    assert sample["n_chars"].mean() > corpus["n_chars"].mean()


def test_keyword_tag_zero_hit_doc(spark):
    """A document with no dictionary tokens must still appear, with
    n_hits = 0 and empty tags (the oracle's LEFT JOIN contract)."""
    from youtube_trending_data_pipeline_spark import catalog_curation as cc

    df = spark.createDataFrame(
        [(1, "zz yy xx"), (2, "join scan spark")], "doc_id long, text string"
    )
    orig_t = cc.t
    try:
        cc.t = lambda s_, d, n: df
        out = {r.doc_id: r for r in cc.keyword_tag(spark, "x").collect()}
    finally:
        cc.t = orig_t
    # zero-hit doc present with the empty contract
    assert out[1].n_hits == 0 and out[1].tags == ""
    assert out[2].n_hits == 3 and out[2].tags == "engine,ops"


def test_conversation_render_caps_turns(spark):
    df = QUERIES["conversation_render"].fn(spark, SF)
    mx = df.agg(F.max("n_turns")).collect()[0][0]
    assert mx <= 12
    row = df.orderBy("user_id").first()
    assert row.transcript.count(" | ") == row.n_turns - 1


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """The winnowing density guarantee: two documents sharing a token
    run of length >= w + k - 1 (= 6) must share at least one
    (hash) fingerprint value — the property MOSS copy-detection relies
    on."""
    from youtube_trending_data_pipeline_spark import catalog_curation as cc

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    df = spark.createDataFrame(
        [
            (1, "one two three " + shared + " four five six"),
            (2, "seven eight " + shared + " nine ten eleven twelve"),
        ],
        "doc_id long, text string",
    )
    orig_t = cc.t
    try:
        cc.t = lambda spark, sf_dir, name: df
        out = {r.doc_id: r.fps for r in cc.text_winnow_fingerprints(spark, "x").collect()}
    finally:
        cc.t = orig_t
    h1 = {p.split(":")[1] for p in out[1].split(",") if p}
    h2 = {p.split(":")[1] for p in out[2].split(",") if p}
    assert h1 & h2, (h1, h2)


def test_gini_extremes(spark):
    """gini_ppm: all-same-token doc scores 0; all-distinct doc scores
    1e6 * (1 - 1/n) floor'd."""
    from youtube_trending_data_pipeline_spark import catalog_curation as cc

    df = spark.createDataFrame(
        [(1, "x x x x"), (2, "a b c d")], "doc_id long, text string"
    )
    orig_t = cc.t
    try:
        cc.t = lambda spark, sf_dir, name: df
        out = {r.doc_id: r.gini_ppm for r in cc.token_gini_diversity(spark, "x").collect()}
    finally:
        cc.t = orig_t
    assert out[1] == 0
    assert out[2] == 1000000 - 1000000 // 4  # 750000


def test_hits_bipartite_roles(spark):
    """On the supplier->customer bipartite graph every hub is a supplier
    node (< 1e6) and every authority a customer node (>= 1e6); the two
    max-normalized score sets each peak at exactly HITS_SCALE."""
    from youtube_trending_data_pipeline_spark.operators.graph import HITS_SCALE

    rows = QUERIES["graph_hits"].fn(spark, SF).collect()
    hubs = [r for r in rows if r.kind == "hub"]
    auths = [r for r in rows if r.kind == "auth"]
    assert hubs and auths
    assert all(r.node < 1000000 for r in hubs)
    assert all(r.node >= 1000000 for r in auths)
    assert max(r.score for r in hubs) == HITS_SCALE
    assert max(r.score for r in auths) == HITS_SCALE


def test_decontaminated_train_is_leak_free(spark):
    """No surviving train doc may share an 8-gram shingle with any eval
    doc — re-derive both shingle sets independently and intersect."""
    import hashlib

    clean = {
        r.doc_id
        for r in QUERIES["split_decontaminated_train"].fn(spark, SF).collect()
    }
    docs = (
        QUERIES["split_decontaminated_train"]
        .fn.__globals__["t"](spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
    )
    def split_of(doc_id):
        return "train" if hashlib.md5(str(doc_id).encode()).hexdigest()[0] in "0123456789ab" else "eval"
    def shingles(text):
        toks = text.lower().split(" ")
        return {" ".join(toks[k:k+8]) for k in range(max(len(toks)-7, 0))}
    eval_sh = set()
    for r in docs:
        if split_of(r.doc_id) == "eval":
            eval_sh |= shingles(r.text)
    for r in docs:
        if r.doc_id in clean:
            assert split_of(r.doc_id) == "train"
            assert not (shingles(r.text) & eval_sh), r.doc_id


def test_domain_quota_cap_holds(spark):
    out = QUERIES["domain_quota_sample"].fn(spark, SF).toPandas()
    assert (out.groupby("source").size() <= 50).all()
    assert (out["rn"] <= 50).all()


def test_kmv_estimate_within_bound(spark):
    """KMV relative error concentrates around 1/sqrt(k-1) ~ 12.6% at
    k=64; assert the estimate is within 3 sigma of exact (and the
    degenerate small-corpus branch returns exact)."""
    r = QUERIES["sketch_kmv_distinct"].fn(spark, SF).collect()[0]
    if r.k_used < 64:
        assert r.kmv_estimate == r.exact_distinct
    else:
        rel = abs(r.kmv_estimate - r.exact_distinct) / r.exact_distinct
        assert rel < 3 * 0.126, (r.kmv_estimate, r.exact_distinct)


def test_cooccurrence_pairs_are_canonical(spark):
    """Every pair is emitted in sorted (w1 < w2) order exactly once —
    no (b,a)/(a,b) double counting."""
    rows = QUERIES["token_cooccurrence_pairs"].fn(spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.w1 < r.w2, (r.w1, r.w2)
        assert (r.w1, r.w2) not in seen
        seen.add((r.w1, r.w2))


def test_dhash_separates_gradient_direction(spark):
    """dHash invariants: byte-identical images share a hash; reversing
    the brightness gradient flips comparison bits (different hash); and
    uniform images hash to 0."""
    from youtube_trending_data_pipeline_spark.operators.multimodal import (
        _dhash_impl,
    )

    def ppm(pixels):
        return b"P6\n3 2\n255\n" + bytes(pixels)

    asc = ppm([min(i * 10, 255) for i in range(18)])
    asc2 = ppm([min(i * 10, 255) for i in range(18)])
    desc = ppm([max(0, 170 - i * 10) for i in range(18)])
    flat = ppm([7] * 18)
    assert _dhash_impl(asc) == _dhash_impl(asc2)
    assert _dhash_impl(asc) != _dhash_impl(desc)
    assert _dhash_impl(flat) == 0


def test_dhash_dedup_groups_cover_corpus(spark):
    """Every document lands in exactly one perceptual group and group
    sizes sum to the corpus size; keeper is the min member."""
    rows = QUERIES["multimodal_image_dhash_dedup"].fn(spark, SF).collect()
    total = sum(r.n_images for r in rows)
    docs = (
        QUERIES["multimodal_image_dhash_dedup"]
        .fn.__globals__["t"](spark, SF, "documents")
        .count()
    )
    assert total == docs
    for r in rows:
        members = [int(x) for x in r.members.split(",")]
        assert len(members) == r.n_images
        assert min(members) == r.keeper_id


def test_fim_roundtrip_reconstructs_document(spark):
    """PSM rendering is lossless: prefix + middle + suffix re-concatenate
    to the original token sequence for every fim-mode doc."""
    rows = QUERIES["fim_transform"].fn(spark, SF).collect()
    modes = {r.mode for r in rows}
    assert modes == {"fim", "plain"}
    import re

    for r in rows:
        if r.mode != "fim":
            continue
        m = re.fullmatch(r"<PRE>(.*)<SUF>(.*)<MID>(.*)", r.rendered, re.S)
        assert m, r.rendered[:80]
        pre, suf, mid = m.groups()
        toks = " ".join(x for x in (pre, mid, suf) if x)
        assert len(toks.split(" ")) == r.n_tokens, r.doc_id


def test_preference_pairs_margins_and_uniqueness(spark):
    """chosen always outranks rejected (margin >= 0 by the ordering,
    ties broken by id), and no document appears in two pairs."""
    rows = QUERIES["preference_pair_assembly"].fn(spark, SF).collect()
    assert rows
    used = set()
    for r in rows:
        assert r.margin >= 0
        assert r.chosen_id != r.rejected_id
        for d in (r.chosen_id, r.rejected_id):
            assert d not in used, d
            used.add(d)


def test_python_kernels_partition_invariant(spark):
    """The two Arrow-batched Python kernels added this round (EWMA
    grouped fold, dHash mapInPandas) must produce identical results
    under any input partitioning — the property that makes them safe
    on a 1000-executor cluster."""
    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    for name in ("ewma_user_value", "multimodal_image_dhash_dedup"):
        fn = QUERIES[name].fn
        base = canon(fn(spark, SF))
        # re-run with the scan forced through different partitionings
        import youtube_trending_data_pipeline_spark.catalog as cat

        orig_t = cat.t
        for parts in (1, 7):
            def t_repart(s, d, n, _orig=orig_t, _p=parts):
                return _orig(s, d, n).repartition(_p)
            cat.t = t_repart
            # catalog_curation binds t at import; patch it too
            import youtube_trending_data_pipeline_spark.catalog_curation as cc
            orig_cc = cc.t
            cc.t = t_repart
            try:
                assert canon(fn(spark, SF)) == base, (name, parts)
            finally:
                cat.t = orig_t
                cc.t = orig_cc


def test_triplets_are_semantically_valid(spark):
    """Positive shares the anchor's label; every negative does not; the
    positive never appears among the negatives."""
    rows = QUERIES["contrastive_triplet_mining"].fn(spark, SF).collect()
    assert rows
    emb = (
        QUERIES["contrastive_triplet_mining"]
        .fn.__globals__["t"](spark, SF, "embeddings")
        .select("vec_id", "label")
        .collect()
    )
    label = {r.vec_id: r.label for r in emb}
    for r in rows:
        negs = [int(x) for x in r.neg_ids.split(",")]
        assert label[r.pos_id] == label[r.anchor_id]
        assert all(label[n] != label[r.anchor_id] for n in negs)
        assert r.pos_id not in negs


def test_box2_resize_kernel_invariants(spark):
    """Box-filter resize: uniform image stays uniform; a checkerboard of
    0/255 averages to floor(510/4)=127 per channel; odd dims rejected."""
    from youtube_trending_data_pipeline_spark.operators.multimodal import (
        _resize_box2_impl,
    )
    import pytest as _pytest

    def ppm(w, h, pixels):
        return f"P6\n{w} {h}\n255\n".encode() + bytes(pixels)

    ow, oh, hexpix = _resize_box2_impl(ppm(4, 4, [9] * 48))
    assert (ow, oh) == (2, 2)
    assert hexpix == "09" * 12
    # 2x2 checkerboard: pixels (0,0)=(255,255,255), (1,0)=0, (0,1)=0, (1,1)=255
    board = [255] * 3 + [0] * 3 + [0] * 3 + [255] * 3
    ow, oh, hexpix = _resize_box2_impl(ppm(2, 2, board))
    assert (ow, oh) == (1, 1)
    assert hexpix == "7f" * 3  # floor(510/4) = 127
    with _pytest.raises(ValueError):
        _resize_box2_impl(ppm(3, 2, [0] * 18))


def test_gdpr_delete_is_complete_and_audited(spark):
    """No deletion-cohort user survives; audit counts are consistent
    with the raw table."""
    rows = QUERIES["gdpr_delete_propagation"].fn(spark, SF).collect()
    assert rows
    def hv(u):
        return ((u % 2147483648) * 2654435761) % 4294967296
    for r in rows:
        assert hv(r.user_id) % 20 != 0
    ev = (
        QUERIES["gdpr_delete_propagation"]
        .fn.__globals__["t"](spark, SF, "events")
        .select("user_id")
        .collect()
    )
    purged_users = {e.user_id for e in ev if hv(e.user_id) % 20 == 0}
    purged_rows = sum(1 for e in ev if e.user_id in purged_users)
    assert rows[0].n_purged_users == len(purged_users)
    assert rows[0].n_purged_rows == purged_rows
    assert sum(r.n_kept for r in rows) == len(ev) - purged_rows


def test_corrupt_images_quarantine_not_crash(spark):
    """A corrupt asset must survive the dHash and resize kernels as a
    NULL row (quarantine), never an executor exception."""
    from youtube_trending_data_pipeline_spark.operators.multimodal import (
        _dhash_impl,
        _resize_box2_impl,
        image_dhash,
        resize_images_box2,
    )

    assert _dhash_impl(b"not an image") is None
    assert _resize_box2_impl(b"\x00\x01\x02") == (None, None, None)
    media = spark.createDataFrame(
        [
            ("ok", "image", b"P6\n2 2\n255\n" + bytes(range(12)), None),
            ("bad", "image", b"garbage-bytes", None),
        ],
        "asset_id string, media_type string, content binary, uri string",
    )
    d = {r.asset_id: r.dhash for r in image_dhash(media).collect()}
    assert d["bad"] is None and d["ok"] is not None
    rz = {r.asset_id: r.out_w for r in resize_images_box2(media).collect()}
    assert rz["bad"] is None and rz["ok"] == 1


def test_corrupt_audio_video_quarantine(spark):
    """Corrupt audio yields an all-NULL feature row; corrupt video yields
    one NULL quarantine frame row — neither kills the kernel."""
    from youtube_trending_data_pipeline_spark.operators.multimodal import (
        extract_audio_features,
        extract_video_frame_features,
    )

    media = spark.createDataFrame(
        [("bad-a", "audio", b"not-a-wav", None),
         ("bad-v", "video", b"not-a-y4m", None)],
        "asset_id string, media_type string, content binary, uri string",
    )
    arow = extract_audio_features(media).collect()
    assert len(arow) == 1 and arow[0].sample_rate is None
    assert arow[0].n_bytes == 9  # byte length still audited
    vrow = extract_video_frame_features(media).collect()
    assert len(vrow) == 1 and vrow[0].frame_idx is None


def test_merkle_root_detects_single_doc_change(spark):
    """The integrity property: flipping ONE document's text changes the
    root hash, and the divergent subtree is locatable level by level."""
    from youtube_trending_data_pipeline_spark import catalog_curation as cc

    base = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "doc_id long, text string"
    )
    changed = spark.createDataFrame(
        [(i, "TAMPERED" if i == 17 else f"text {i}") for i in range(40)],
        "doc_id long, text string",
    )
    orig_t = cc.t
    try:
        cc.t = lambda s, d, n: base
        a = {(r.level, r.bucket): r.h for r in cc.corpus_merkle_tree(spark, "x").collect()}
        cc.t = lambda s, d, n: changed
        b = {(r.level, r.bucket): r.h for r in cc.corpus_merkle_tree(spark, "x").collect()}
    finally:
        cc.t = orig_t
    # root differs
    assert a[(4, 0)] != b[(4, 0)]
    # the divergent path is exactly doc 17's ancestry; siblings agree
    diff = {k for k in a if a[k] != b[k]}
    assert diff == {(0, 17), (1, 1), (2, 0), (3, 0), (4, 0)}


def test_pr_curve_monotonicity(spark):
    """Raising the threshold can only shrink tp and fp (recall is
    non-increasing); fn is the complement of tp over a fixed gold set."""
    rows = sorted(
        QUERIES["eval_pr_curve"].fn(spark, SF).collect(),
        key=lambda r: r.thresh,
    )
    gold_total = rows[0].tp + rows[0].fn
    prev = None
    for r in rows:
        assert r.tp + r.fn == gold_total
        if prev is not None:
            assert r.tp <= prev.tp and r.fp <= prev.fp
        prev = r


def test_knn_confusion_totals(spark):
    """Confusion cells sum to the number of queries (5 anchors)."""
    rows = QUERIES["eval_knn_confusion"].fn(spark, SF).collect()
    assert sum(r.n for r in rows) == 5


def test_sft_mask_offsets_split_prompt_from_response(spark):
    """rendered[:mask_end] is exactly the prompt span (template +
    instruction + assistant marker); rendered[mask_end:] is the
    response the loss trains on."""
    rows = QUERIES["sft_render_masked"].fn(spark, SF).limit(20).collect()
    assert rows
    for r in rows:
        assert len(r.rendered) == r.total_len
        prompt, response = r.rendered[: r.mask_end], r.rendered[r.mask_end:]
        assert prompt.startswith("<|user|>")
        assert prompt.endswith("<|assistant|>")
        assert response and "<|" not in response


def test_attention_spans_tile_each_pack(spark):
    """Within every (source, pack), spans are disjoint and contiguous:
    each doc starts where the previous ended (mod carry), never
    exceeding the 512-token pack."""
    rows = QUERIES["pack_attention_spans"].fn(spark, SF).collect()
    by_pack = {}
    for r in rows:
        by_pack.setdefault((r.source, r.pack_id), []).append(r)
    for (_, _), docs in by_pack.items():
        docs.sort(key=lambda r: r.span_start)
        for r in docs:
            assert 0 <= r.span_start <= r.span_end <= 512
        for a, b in zip(docs, docs[1:]):
            assert b.span_start >= a.span_end or a.carry_tokens > 0


def test_binaryfile_source_feeds_image_kernels(spark, tmp_path):
    """The production multimodal ingestion path: image FILES on disk read
    through Spark's binaryFile source -> (path, content) rows -> the
    same dHash/resize kernels, no bespoke loader."""
    from pyspark.sql import functions as F

    from youtube_trending_data_pipeline_spark.operators.multimodal import (
        image_dhash,
    )

    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(4):
        (d / f"img{i}.ppm").write_bytes(
            b"P6\n2 2\n255\n" + bytes((i * 17 + j) % 256 for j in range(12))
        )
    media = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.ppm")
        .load(str(d))
        .select(
            F.element_at(F.split("path", "/"), -1).alias("asset_id"),
            F.lit("image").alias("media_type"),
            F.col("content"),
            F.lit(None).cast("string").alias("uri"),
        )
    )
    out = {r.asset_id: r.dhash for r in image_dhash(media).collect()}
    assert len(out) == 4
    assert all(v is not None for v in out.values())


def test_interleave_offsets_are_splice_consistent(spark):
    """Per doc: segments ordered by seq_pos have token offsets 0, n1,
    n1+1 and the two text chunks re-concatenate to the full document."""
    rows = QUERIES["interleave_image_text"].fn(spark, SF).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    docs = {
        r.doc_id: r.text
        for r in QUERIES["interleave_image_text"]
        .fn.__globals__["t"](spark, SF, "documents")
        .collect()
    }
    for doc_id, segs in list(by_doc.items())[:50]:
        segs.sort(key=lambda r: r.seq_pos)
        assert [s.kind for s in segs] == ["text", "image", "text"]
        t1, img, t2 = segs
        n1 = len(t1.content_ref.split(" "))
        assert (t1.token_offset, img.token_offset, t2.token_offset) == (
            0, n1, n1 + 1,
        )
        assert img.content_ref == f"asset://{doc_id}"
        joined = (t1.content_ref + " " + t2.content_ref).split()
        orig = [x for x in docs[doc_id].lower().split(" ") if x]
        assert joined == orig


def test_span_corruption_is_lossless(spark):
    """Splicing each target span back over its sentinel in the corrupted
    input reconstructs the original document, for every doc."""
    import re

    rows = QUERIES["span_corruption_t5"].fn(spark, SF).limit(50).collect()
    docs = {
        r.doc_id: [x for x in r.text.lower().split(" ") if x]
        for r in QUERIES["span_corruption_t5"]
        .fn.__globals__["t"](spark, SF, "documents")
        .collect()
    }
    assert rows
    for r in rows:
        spans = {}
        for m in re.finditer(r"<extra_id_(\d+)> (\S+) (\S+)", r.target):
            spans[int(m.group(1))] = [m.group(2), m.group(3)]
        assert len(spans) >= 1
        rebuilt = []
        for tok in r.corrupted.split(" "):
            m = re.fullmatch(r"<extra_id_(\d+)>", tok)
            rebuilt.extend(spans[int(m.group(1))] if m else [tok])
        assert rebuilt == docs[r.doc_id], r.doc_id


def test_dhash_large_image_fits_int64(spark):
    """The 63-bit XOR fold: a 16x16 image (480 comparison bits) must
    produce a hash that fits the LongType column instead of overflowing
    the Arrow conversion; thumbnails (< 63 bits) are unchanged."""
    from youtube_trending_data_pipeline_spark.operators.multimodal import (
        _dhash_impl,
        image_dhash,
    )

    big = b"P6\n16 16\n255\n" + bytes((i * 7) % 256 for i in range(16 * 16 * 3))
    h = _dhash_impl(big)
    assert 0 <= h < (1 << 63)
    media = spark.createDataFrame(
        [("big", "image", big, None)],
        "asset_id string, media_type string, content binary, uri string",
    )
    rows = image_dhash(media).collect()
    assert rows[0].dhash == h


def test_video_uri_only_still_raises(spark):
    """The URI seam contract: a video row with NULL content must raise
    (missing fetch step = misconfiguration), not quarantine silently."""
    import pytest as _pytest

    from youtube_trending_data_pipeline_spark.operators.multimodal import (
        _video_frame_rows,
    )

    with _pytest.raises(NotImplementedError):
        list(_video_frame_rows("a", None, 1000))


def test_span_count_matches_emitted_sentinels(spark):
    """n_spans equals the number of sentinels actually present in the
    corrupted text — including the n % 10 == 1 boundary where the final
    position cannot start a span."""
    import re

    from youtube_trending_data_pipeline_spark import catalog_curation as cc

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(21))),   # n=21: 2 spans
         (2, " ".join(f"w{i}" for i in range(20)))],  # n=20: 2 spans
        "doc_id long, text string",
    )
    orig_t = cc.t
    try:
        cc.t = lambda s_, d, n: df
        rows = {r.doc_id: r for r in cc.span_corruption_t5(spark, "x").collect()}
    finally:
        cc.t = orig_t
    for r in rows.values():
        n_sentinels = len(re.findall(r"<extra_id_\d+>", r.corrupted))
        assert r.n_spans == n_sentinels, (r.doc_id, r.n_spans, n_sentinels)


# ---------------------------------------------------------------------------
# Round-6 additions: PQ encode, BLEU components, bloom probe
# ---------------------------------------------------------------------------


def test_pq_encode_centroids_self_code_and_coverage(spark):
    """Every codebook pivot (the 8 smallest vec_ids) must encode to
    ITSELF with distance 0 in every subspace, every corpus vector gets
    exactly one code per subspace, and all codes come from the pivot
    set."""
    rows = QUERIES["embedding_pq_encode"].fn(spark, SF).collect()
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, {})[r.sub] = (r.code, r.dist_q)
    n_vecs = (
        spark.read.parquet(f"{SF}/embeddings.parquet").count()
    )
    assert len(by_vec) == n_vecs
    pivot_ids = sorted(by_vec)[:8]
    for vid, subs in by_vec.items():
        assert sorted(subs) == [0, 1, 2, 3], (vid, subs)
        for code, dist in subs.values():
            assert code in pivot_ids
            assert dist >= 0
    for pid in pivot_ids:
        for sub, (code, dist) in by_vec[pid].items():
            assert (code, dist) == (pid, 0), (pid, sub, code, dist)


def test_bleu_components_identical_and_disjoint_pairs(spark):
    """An identical candidate/reference pair scores 1e6 ppm at both n;
    a token-disjoint pair scores 0; clipping caps repeated candidate
    grams at the reference count."""
    from youtube_trending_data_pipeline_spark import catalog_curation as cc
    import tempfile

    docs = [
        (0, "a b c d"), (1, "a b c d"),          # identical -> 1e6
        (2, "a b c d"), (3, "x y z w"),          # disjoint -> 0
        (4, "p q"), (5, "p p p q"),              # clip: p counted once
    ]
    d = tempfile.mkdtemp(prefix="bleu-")
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    got = {
        r.pair_id: (r.n_cand_tokens, r.p1_ppm, r.p2_ppm)
        for r in QUERIES["eval_bleu_components"].fn(spark, d).collect()
    }
    assert got[1] == (4, 1_000_000, 1_000_000)
    assert got[3] == (4, 0, 0)
    # cand "p p p q": p1 = (min(3,1) + min(1,1)) / 4 = 0.5
    # bigrams: 'p p' x2 (ref 0), 'p q' x1 (ref 1) -> 1/3
    assert got[5] == (4, 500_000, 333_333)


def test_bloom_probe_no_false_negatives(spark):
    """The bloom invariant: every exact member must be a bloom hit
    (false positives allowed, false negatives impossible), and matched
    bit counts stay in [0, 3]."""
    rows = QUERIES["sketch_bloom_probe"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_matched <= 3
        if r.is_member:
            assert r.bloom_hit, r
        if r.bloom_hit:
            assert r.n_matched == 3


def test_detokenize_roundtrip_exact_when_no_unk(spark):
    """The lossless-round-trip contract: every document with zero UNKs
    MUST reconstruct exactly; documents with UNKs must not claim
    exactness."""
    rows = QUERIES["detokenize_roundtrip"].fn(spark, SF).collect()
    assert rows
    no_unk = [r for r in rows if r.n_unk == 0]
    assert no_unk, "vocab c>=2 should cover some documents fully"
    for r in no_unk:
        assert r.roundtrip_exact, r
    for r in rows:
        if r.n_unk > 0:
            assert not r.roundtrip_exact, r


def test_matryoshka_energy_monotone_and_zero_shuffle(spark):
    """Prefix energies are monotone (e16 <= e32 <= 1e6) and the plan has
    NO exchange — it is a pure map-side projection."""
    from youtube_trending_data_pipeline_spark.plans.explain import (
        physical_plan,
    )

    df = QUERIES["embedding_matryoshka_truncate"].fn(spark, SF)
    plan = physical_plan(df)
    assert "Exchange" not in plan, plan
    for r in df.collect():
        assert 0 <= r.energy16_ppm <= r.energy32_ppm <= 1_000_000, r
        assert 0 <= r.norm_16_q <= r.norm_full_q, r


def test_tokenizer_fertility_bounds(spark):
    """Every whitespace word yields at least one BPE-ish subword, so
    fertility >= 1e6 ppm per language."""
    rows = QUERIES["tokenizer_fertility"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_subwords >= r.n_words > 0, r
        assert r.fertility_ppm >= 1_000_000, r


def test_chunk_stitch_detects_all_adjacent_seams(spark):
    """Ground-truth completeness: for every document, every consecutive
    chunk pair (full 200-char chunk followed by a >=50-char chunk) must
    appear as a detected pair flagged adjacent=True."""
    import duckdb

    rows = QUERIES["chunk_stitch_detect"].fn(spark, SF).collect()
    detected = {
        (r.a_doc, r.a_start, r.b_doc, r.b_start)
        for r in rows
        if r.adjacent
    }
    con = duckdb.connect()
    expect = con.execute(
        f"""
        WITH c AS (
          SELECT doc_id, CAST(start AS INT) AS s,
                 len(substr(text, CAST(start AS INT) + 1, 200)) AS l
          FROM (SELECT doc_id, text, unnest(range(0, n_chars, 150)) AS start
                FROM '{SF}/documents.parquet' WHERE n_chars > 0)
        )
        SELECT a.doc_id, a.s FROM c a JOIN c b
          ON a.doc_id = b.doc_id AND b.s = a.s + 150
        WHERE a.l = 200 AND b.l >= 50
        """
    ).fetchall()
    for doc, s in expect:
        assert (doc, s, doc, s + 150) in detected, (doc, s)
    assert expect, "testdata should contain documents longer than 200 chars"


def test_round6_multimodal_kernels_quarantine_and_semantics(spark):
    """The round-6 kernels inherit the quarantine contract (corrupt
    bytes -> one NULL row, never a crash) and their integer semantics
    hold on crafted assets: a hard black->white frame change is a cut,
    a constant clip has zero cuts; an all-black image lands entirely in
    bucket 0; leading/trailing quiet samples count exactly."""
    import struct

    from youtube_trending_data_pipeline_spark.operators.multimodal import (
        audio_silence_trim,
        detect_scene_cuts,
        image_gray_histogram,
    )

    # video: 2x2 C420, 3 frames: black, black, white -> cut only at idx 2
    def frame(y: int) -> bytes:
        return b"FRAME\n" + bytes([y] * 4) + bytes([128, 128])

    clip = (
        b"YUV4MPEG2 W2 H2 F10:1 Ip A1:1 C420\n"
        + frame(0) + frame(0) + frame(255)
    )
    media = spark.createDataFrame(
        [("v", "video", clip), ("bad", "video", b"junk")],
        "asset_id string, media_type string, content binary",
    )
    cuts = {
        (r.asset_id, r.frame_idx): (r.delta_ppm, r.is_cut)
        for r in detect_scene_cuts(media).collect()
    }
    assert cuts[("v", 1)] == (0, False)
    assert cuts[("v", 2)] == (1_000_000, True)
    assert cuts[("bad", None)] == (None, None)

    # image: all-black 2x2 -> 4 pixels in bucket 0
    img = spark.createDataFrame(
        [("black", "image", b"P6\n2 2\n255\n" + bytes(12)),
         ("bad", "image", b"nope")],
        "asset_id string, media_type string, content binary",
    )
    hist = {
        (r.asset_id, r.bucket): r.n_px
        for r in image_gray_histogram(img).collect()
    }
    assert hist[("black", 0)] == 4
    assert hist[("bad", None)] is None

    # audio: samples [10, 5000, -4000, 20] at threshold 256 -> lead 1, tail 1
    def wav(samples):
        data = b"".join(struct.pack("<h", s) for s in samples)
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 1000, 2000, 2, 16)
            + b"data" + struct.pack("<I", len(data))
        )
        return hdr + data
    aud = spark.createDataFrame(
        [("a", "audio", wav([10, 5000, -4000, 20])),
         ("quiet", "audio", wav([0, 0])),
         ("bad", "audio", b"x")],
        "asset_id string, media_type string, content binary",
    )
    trims = {
        r.asset_id: (r.n_samples, r.lead_silent, r.tail_silent)
        for r in audio_silence_trim(aud).collect()
    }
    assert trims["a"] == (4, 1, 1)
    assert trims["quiet"] == (2, 2, 2)
    assert trims["bad"] == (None, None, None)


def test_label_propagation_matches_reference_and_splits_communities(spark):
    """Synchronous LPA must equal a straightforward Python reference on
    a crafted graph (two 4-cliques joined by one bridge), and — unlike
    connected components — keep the two dense communities under
    distinct labels even though the bridge makes them ONE component."""
    from youtube_trending_data_pipeline_spark.operators.components import (
        connected_components,
    )
    from youtube_trending_data_pipeline_spark.operators.graph import (
        label_propagation_sync,
    )

    a, b = [1, 2, 3, 4], [10, 11, 12, 13]
    und = [
        (x, y) for grp in (a, b) for x in grp for y in grp if x != y
    ] + [(4, 10), (10, 4)]
    edges = spark.createDataFrame(und, "src long, dst long")

    got = {
        r.node: r.label
        for r in label_propagation_sync(edges, iterations=3).collect()
    }

    # reference: labels[v] <- most frequent in-neighbor label, min on ties
    from collections import Counter, defaultdict

    inn = defaultdict(list)
    for s, d in und:
        inn[d].append(s)
    labels = {v: v for grp in (a, b) for v in grp}
    for _ in range(3):
        nxt = {}
        for v, srcs in inn.items():
            c = Counter(labels[s] for s in srcs)
            best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            nxt[v] = best
        labels = nxt
    assert got == labels

    comp = {
        r.node: r.component
        for r in connected_components(edges).collect()
    }
    assert len(set(comp.values())) == 1  # bridge joins everything
    assert len({got[v] for v in a} | {got[v] for v in b}) >= 2
    assert {got[v] for v in a}.isdisjoint({got[v] for v in b})


def test_label_propagation_keeps_source_only_nodes(spark):
    """ADVICE r6: on a DIRECTED graph a node with no labeled in-neighbor
    (source-only or isolated in-degree) must keep its own label and stay
    in the output every round — not silently vanish."""
    from youtube_trending_data_pipeline_spark.operators.graph import (
        label_propagation_sync,
    )

    # 1 -> 2 -> 3 chain: node 1 has in-degree 0 on every round
    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "src long, dst long"
    )
    for iters in (1, 3):
        got = {
            r.node: r.label
            for r in label_propagation_sync(edges, iterations=iters).collect()
        }
        assert set(got) == {1, 2, 3}, got
        assert got[1] == 1  # keep-own-label fallback
    # after 2+ rounds labels flow down the chain
    assert got[2] == 1 and got[3] == 1


def test_pq_adc_exact_on_codebook_members(spark):
    """ADC search degenerates to exact search for vectors that ARE
    codebook centroids: a query equal to centroid vector c gets
    adc_dist 0 to c (every subspace table entry is 0 at c's own code)
    and must rank it first."""
    import numpy as np

    from youtube_trending_data_pipeline_spark.operators.similarity import (
        pq_adc_topk,
    )

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(12, 16)).astype("float32")
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(12)],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(100 + c, [float(x) for x in vecs[c]]) for c in range(4)],
        "query_id long, embedding array<float>",
    )
    out = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_dist_q)
        for r in pq_adc_topk(
            corpus, queries, k=2, dim=16, m=2, n_centroids=4
        ).collect()
    }
    for c in range(4):
        nbr, dist = out[(100 + c, 1)]
        assert (nbr, dist) == (c, 0), (c, nbr, dist)


def test_dsir_importance_steers_toward_target_vocabulary(spark, tmp_path):
    """A planted corpus where target-domain (en) docs use a disjoint
    vocabulary: every selected doc must be one that speaks the target
    vocabulary, and target-vocab docs must outscore off-domain ones."""
    import youtube_trending_data_pipeline_spark.catalog_curation as cc
    from youtube_trending_data_pipeline_spark.catalog import QUERIES

    d = str(tmp_path)
    rows = []
    # 40 en docs with vocabulary A; 40 de docs with vocabulary B;
    # 10 unlabeled-lang docs speaking A (should be selected) and 10
    # speaking B (should not)
    for i in range(40):
        rows.append((i, "alpha beta gamma delta", "en", "s", 4))
    for i in range(40, 80):
        rows.append((i, "omega sigma tau rho", "de", "s", 4))
    for i in range(80, 90):
        rows.append((i, "alpha beta gamma delta", "xx", "s", 4))
    for i in range(90, 100):
        rows.append((i, "omega sigma tau rho", "xx", "s", 4))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    out = QUERIES["dsir_importance_select"].fn(spark, d).collect()
    assert len(out) == cc._DSIR_TOP
    by_id = {r["doc_id"]: r["score"] for r in out}
    vocab_a = set(range(40)) | set(range(80, 90))
    # every selected doc speaks the target vocabulary
    assert set(by_id) <= vocab_a
    # and the xx-lang A-speakers made the cut over every B-speaker
    assert set(range(80, 90)) <= set(by_id)


def test_boilerplate_shingle_marks_planted_template(spark, tmp_path):
    """100 docs in one source; a 4-token template planted in 10 of them
    (10% >= the 8% threshold) must be marked boilerplate, while each
    doc's unique filler shingles (1 doc each, 1%) must not."""
    from youtube_trending_data_pipeline_spark.catalog import QUERIES

    d = str(tmp_path)
    rows = []
    template = "subscribe to our newsletter"
    for i in range(100):
        filler = f"u{i}a u{i}b u{i}c u{i}d u{i}e"
        text = (filler + " " + template) if i < 10 else filler
        rows.append((i, text, "en", "srcA", len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    out = {r["doc_id"]: r for r in
           QUERIES["boilerplate_shingle_mark"].fn(spark, d).collect()}
    assert len(out) == 100
    for i in range(100):
        if i < 10:
            # template docs: filler(5)+template(4) = 9 tokens -> 6
            # shingles; the planted template contributes boilerplate
            assert out[i]["n_boiler"] >= 1, i
            assert out[i]["boiler_ppm"] > 0
        else:
            assert out[i]["n_boiler"] == 0, i
            assert out[i]["boiler_ppm"] == 0


def test_ivfadc_residual_exact_on_codebook_members(spark):
    """Residual ADC degenerates to exact search for vectors whose
    residual IS a codeword: with seeds = first 4 ids and the residual
    codebook = the NEXT 4 ids, a query equal to codebook vector v gets
    adc_dist 0 to v (its top probe is v's own cell, its residual
    matches v's codeword in every subspace), so v must appear in the
    zero-distance tier of v's own result set.  (Rank-1 exactly is NOT
    guaranteed: a seed's residual is the ZERO vector, and when its
    nearest codeword is v's residual the seed reconstructs to ~v and
    legitimately ties at adc_dist 0 — approximate-search semantics.)"""
    import numpy as np

    from youtube_trending_data_pipeline_spark.operators.similarity import (
        ivfadc_residual_topk,
    )

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(16, 16)).astype("float32")
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(16)],
        "vec_id long, embedding array<float>",
    )
    # codebook members are ids 4..7 (the 4 vectors after the 4 seeds)
    queries = spark.createDataFrame(
        [(100 + c, [float(x) for x in vecs[c]]) for c in range(4, 8)],
        "query_id long, embedding array<float>",
    )
    rows = ivfadc_residual_topk(
        corpus, queries, k=5, n_cells=4, n_probe=2,
        dim=16, m=2, n_centroids=4,
    ).collect()
    for c in range(4, 8):
        hits = {
            r.neighbor_id: r.adc_dist_q
            for r in rows
            if r.query_id == 100 + c and r.adc_dist_q == 0
        }
        assert c in hits, (c, sorted(hits))


def test_ivfadc_residual_codebook_excludes_seeds(spark):
    """The residual codebook must be the n_centroids ids AFTER the
    seeds: every emitted code id falls in that id range (seed residuals
    are ~0 and would waste codewords — the documented policy)."""
    import numpy as np

    from youtube_trending_data_pipeline_spark.operators.similarity import (
        _residual_index,
        ivfadc_residual_topk,
    )

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(20, 16)).astype("float32")
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(100, [float(x) for x in vecs[9]])],
        "query_id long, embedding array<float>",
    )
    # the property itself, on the emitted codes: with n_cells=4 seeds
    # (ids 0..3) and n_centroids=4, every code id must be in 4..7
    idx = _residual_index(corpus, n_cells=4, dim=16, m=2, n_centroids=4)
    cb_ids = {r.vec_id for r in idx["cb_ids"].collect()}
    assert cb_ids == {4, 5, 6, 7}
    code_rows = idx["codes"].collect()
    assert len(code_rows) == 20 * 2  # every corpus vector, both subspaces
    assert {r.code for r in code_rows} <= cb_ids
    got = ivfadc_residual_topk(
        corpus, queries, k=3, n_cells=4, n_probe=2,
        dim=16, m=2, n_centroids=4,
    ).collect()
    assert len(got) == 3
    ranks = [r.rank for r in got]
    assert ranks == [1, 2, 3]


def test_substring_spans_marks_planted_shared_run(spark, tmp_path):
    """Two docs share an exact 12-token run (planted); a third is
    unique. The shared run must come back as ONE merged span in each
    sharing doc covering exactly the planted token range; the unique
    doc must be absent."""
    shared = " ".join(f"dup{i}" for i in range(12))
    rows = [
        (1, f"alpha beta {shared} gamma", "en", "web", 0),
        (2, f"{shared} delta epsilon zeta", "en", "web", 0),
        (3, "totally unique words nothing repeats here at all", "en", "web", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).withColumn("n_chars", F.length("text")).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    from youtube_trending_data_pipeline_spark.catalog import QUERIES

    out = {
        r.doc_id: (r.span_start, r.span_end, r.span_tokens)
        for r in QUERIES["dedup_substring_spans"].fn(spark, str(tmp_path)).collect()
    }
    # doc 1: shared run at token positions 3..14 (1-based)
    assert out[1] == (3, 14, 12), out
    # doc 2: shared run at positions 1..12
    assert out[2] == (1, 12, 12), out
    assert 3 not in out


def test_audio_fingerprint_dc_and_gain_invariant(spark):
    """The sign-of-delta fingerprint must be invariant to DC offset and
    positive gain (the two transforms byte hashing is blind to), must
    differ for a reversed waveform, and must quarantine undecodable
    bytes as NULL."""
    import struct

    from youtube_trending_data_pipeline_spark.operators.multimodal import (
        audio_sign_fingerprint,
    )

    def wav(samples):
        data = b"".join(struct.pack("<h", s) for s in samples)
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, 1, 1000, 2000, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    base = [3, -5, 8, 8, -2, 11, 0, 7]
    rows = [
        ("base", "audio", wav(base)),
        ("dc", "audio", wav([s + 100 for s in base])),
        ("gain", "audio", wav([s * 3 for s in base])),
        ("rev", "audio", wav(base[::-1])),
        ("junk", "audio", b"not a wav at all"),
    ]
    media = spark.createDataFrame(
        rows, "asset_id string, media_type string, content binary"
    )
    out = {r.asset_id: r.fp for r in audio_sign_fingerprint(media).collect()}
    assert out["base"] == out["dc"] == out["gain"]
    assert out["rev"] != out["base"]
    assert out["junk"] is None


def test_ffd_packing_respects_capacity_and_isolates_oversize(spark, tmp_path):
    """Every bin's total stays <= 128 tokens unless the bin holds a
    single oversize doc; an oversize doc never shares its bin; and the
    planted shard packs into the FFD-optimal 2 bins (next-fit by id
    order would need 3)."""
    mk = lambda n: " ".join(f"t{i}" for i in range(n))  # noqa: E731
    # all ids congruent mod 8 -> one shard: lengths 70, 60, 58, 68
    # FFD order: 70, 68, 60, 58 -> bins (70+58), (68+60) = 2 bins;
    # next-fit by id order 70, 60, 58, 68 -> (70), (60+58), (68) = 3
    rows = [
        (0, mk(70)), (8, mk(60)), (16, mk(58)), (24, mk(68)),
        # second shard: one oversize doc (200 tokens) + a small one
        (1, mk(200)), (9, mk(30)),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'web' AS source",
        "length(text) AS n_chars",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    from youtube_trending_data_pipeline_spark.catalog import QUERIES

    out = QUERIES["pack_sequences_ffd"].fn(spark, str(tmp_path)).collect()
    by_bin = {}
    for r in out:
        by_bin.setdefault((r.shard, r.bin_id), []).append(r)
    for (sh, b), members in by_bin.items():
        total = sum(m.n_tokens for m in members)
        if total > 128:
            assert len(members) == 1 and members[0].n_tokens > 128, members
    shard0 = {r.doc_id: r.bin_id for r in out if r.doc_id % 8 == 0}
    assert len(set(shard0.values())) == 2, shard0
    # oversize doc alone in its bin
    over = [r for r in out if r.doc_id == 1][0]
    mates = [r for r in out if (r.shard, r.bin_id) == (over.shard, over.bin_id)]
    assert len(mates) == 1


def test_leakage_free_split_keeps_chains_together(spark, tmp_path):
    """A planted A~B~C near-dup chain (A,C never scored directly) must
    land in ONE split — the structural guarantee sample_hash_split's
    per-doc hash cannot give — and singletons still spread across
    splits."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    rows = [(1, base + "alpha"), (2, base + "alpha beta"), (3, base + "beta")]
    # singleton docs with distinct content to populate several splits
    rows += [
        (100 + i, f"unique content number {i} " + " ".join(
            f"w{i}x{j}" for j in range(30)))
        for i in range(40)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'web' AS source",
        "length(text) AS n_chars",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    from youtube_trending_data_pipeline_spark.catalog import QUERIES

    out = {
        r.doc_id: (r.component, r.split)
        for r in QUERIES["split_leakage_free_components"]
        .fn(spark, str(tmp_path)).collect()
    }
    assert out[1] == out[2] == out[3], out  # one component, one split
    assert len({v[1] for v in out.values()}) >= 2  # multiple splits used


def test_substring_spans_apply_reconstructs_cleaned_text(spark, tmp_path):
    """Apply must cut exactly the planted shared run: the cleaned text
    of each sharing doc equals its unique remainder (verified through
    the md5 digest), and the untouched doc's digest equals the md5 of
    its own full token join."""
    import hashlib

    shared = " ".join(f"dup{i}" for i in range(12))
    rows = [
        (1, f"alpha beta {shared} gamma", "en", "web", 0),
        (2, f"{shared} delta epsilon zeta", "en", "web", 0),
        (3, "totally unique words nothing repeats here at all", "en", "web", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).withColumn("n_chars", F.length("text")).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    from youtube_trending_data_pipeline_spark.catalog import QUERIES

    out = {
        r.doc_id: r
        for r in QUERIES["dedup_substring_spans_apply"]
        .fn(spark, str(tmp_path)).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert out[1].n_tokens_removed == 12
    assert out[1].clean_md5 == md5("alpha beta gamma")
    assert out[2].n_tokens_removed == 12
    assert out[2].clean_md5 == md5("delta epsilon zeta")
    assert out[3].n_tokens_removed == 0
    assert out[3].clean_md5 == md5("totally unique words nothing repeats here at all")


def test_sampled_recall_audit_equals_full_when_sample_saturates(spark, tmp_path):
    """With n_docs <= _GT_SAMPLE_TARGET the keep threshold saturates at
    1e6 (every doc sampled), so the sampled audit must reproduce the
    full audit's row exactly, plus n_sampled_docs == n_docs — the
    equivalence that makes the sampled numbers an unbiased estimate of
    the full ones."""
    base = "alpha bravo charlie delta echo foxtrot golf hotel india " * 4
    rows = [(1, base + "one"), (2, base + "two")]
    rows += [
        (10 + i, f"distinct filler number {i} " + " ".join(
            f"t{i}u{j}" for j in range(25)))
        for i in range(30)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'web' AS source",
        "length(text) AS n_chars",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    from youtube_trending_data_pipeline_spark.catalog import QUERIES

    full = QUERIES["dedup_minhash_recall_audit"].fn(
        spark, str(tmp_path)
    ).collect()[0]
    samp = QUERIES["dedup_minhash_recall_audit_sampled"].fn(
        spark, str(tmp_path)
    ).collect()[0]
    assert samp.n_sampled_docs == 32
    for c in ("n_exact", "n_lsh", "n_common", "recall_ppm", "precision_ppm"):
        assert samp[c] == full[c], (c, samp[c], full[c])
    # the planted near-dup pair is actually caught on both sides
    assert samp.n_exact >= 1 and samp.n_common >= 1


def test_sampled_recall_audit_bounds_ground_truth(spark, tmp_path):
    """Above the target the hash sample restricts the ground truth:
    n_sampled_docs lands near _GT_SAMPLE_TARGET, far below the corpus,
    while the audited LSH side still ran full-corpus (its pairs are
    endpoint-filtered, so n_lsh <= the full audit's n_lsh)."""
    rows = [
        (i, f"unique body number {i} " + " ".join(
            f"a{i}b{j}" for j in range(20)))
        for i in range(400)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'web' AS source",
        "length(text) AS n_chars",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    from youtube_trending_data_pipeline_spark.catalog import QUERIES

    samp = QUERIES["dedup_minhash_recall_audit_sampled"].fn(
        spark, str(tmp_path)
    ).collect()[0]
    # thr = 1e6 * 200 // 400 = 500000 -> expected ~200 of 400 docs
    assert 120 <= samp.n_sampled_docs <= 280, samp.n_sampled_docs


def test_components_lsh_clusters_chain_and_spares_singletons(spark, tmp_path):
    """A planted A~B~C chain of token-shingle near-dups (A and C differ
    enough that only B links them) must land in ONE component through
    the LSH candidate path, while distinct docs stay out of the output
    (only edge-participating nodes appear, the dedup_components
    contract)."""
    # 110-token shared base -> per-link Jaccard ~0.96, far above the
    # 0.5 LSH knee (a ~0.8-J chain can deterministically miss the
    # 16x4 banding for a specific fixture — observed while writing this)
    base = "the quick brown fox jumps over the lazy dog again and again " * 10
    rows = [(1, base + "alpha"), (2, base + "alpha beta"), (3, base + "beta")]
    rows += [
        (100 + i, f"totally different content {i} " + " ".join(
            f"w{i}x{j}" for j in range(30)))
        for i in range(10)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'web' AS source",
        "length(text) AS n_chars",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    from youtube_trending_data_pipeline_spark.catalog import QUERIES

    out = {
        r.node: r.component
        for r in QUERIES["dedup_components_lsh"].fn(spark, str(tmp_path))
        .collect()
    }
    assert out.get(1) == out.get(2) == out.get(3) == 1
    assert all(n in (1, 2, 3) for n in out), out  # singletons absent
