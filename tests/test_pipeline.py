"""LLM-pipeline operators: dedup recall/precision against brute force,
similarity vs numpy ground truth, text metrics, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from samza_spark.pipeline import dedup, similarity, text
from samza_spark.pipeline.multimodal import attach_meta, decode_image, sample_audio_frames


@pytest.fixture(scope="module")
def doc_df(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    docs = []
    for i in range(20):
        docs.append((i, f"{base} variant {i} with unique suffix {i * 7}"))
    # planted near-duplicate of doc 0 (one-char perturbation) and an exact
    # duplicate of doc 0 (101 differs only in case)
    docs.append((100, base + " variant 0 with unique suffix 0!"))
    docs.append((101, (base + " variant 0 with unique suffix 0").upper()))
    # exact duplicate of doc 5 (case/whitespace differences only)
    docs.append((102, docs[5][1].upper().replace(" ", "  ")))
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_exact_dedup_normalized(spark, doc_df):
    out = dedup.exact_dedup(doc_df)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert 5 in ids and 102 not in ids  # 102 is a case/whitespace dup of 5
    assert 0 in ids and 101 not in ids  # 101 is a case dup of 0
    assert len(ids) == doc_df.count() - 2


def test_minhash_lsh_finds_planted_near_dups(spark, doc_df):
    pairs = dedup.minhash_lsh_candidates(doc_df, num_perm=32, bands=16)
    got = {(r.a, r.b) for r in pairs.collect()}
    assert (0, 100) in got or (0, 101) in got  # planted near-dups collide
    # verify stage confirms them with high jaccard
    verified = dedup.jaccard_verify(doc_df, pairs, threshold=0.7)
    vgot = {(r.a, r.b) for r in verified.collect()}
    assert (0, 101) in vgot


def test_minhash_dedup_drops_near_dups(spark, doc_df):
    out = dedup.minhash_dedup(doc_df, threshold=0.7, num_perm=32, bands=16)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert 0 in ids and 101 not in ids


def test_simhash_near_dups(spark, doc_df):
    pairs = dedup.simhash_candidates(doc_df, max_hamming=2)
    got = {(r.a, r.b) for r in pairs.collect()}
    assert any(a == 0 and b in (100, 101) for a, b in got)


def _brute_force_hamming_pairs(spark, df, max_hamming, hash_family="xxhash64"):
    sig = df.select(
        "doc_id", dedup.shingle_hashes("text", family=hash_family).alias("__shh")
    ).select("doc_id", dedup.simhash_pandas("__shh").alias("sh"))
    l, r = sig.alias("l"), sig.alias("r")
    return {
        (row.a, row.b, row.hamming)
        for row in l.join(r, F.col("l.doc_id") < F.col("r.doc_id"))
        .withColumn("hamming", F.expr("bit_count(l.sh ^ r.sh)"))
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"), "hamming")
        .collect()
    }


def test_simhash_pigeonhole_recall_is_exactly_brute_force(spark, doc_df):
    """The multi-block candidate generator must find EVERY hamming≤k pair
    (pigeonhole over max_hamming+1 disjoint blocks) — including pairs whose
    differing bits fall in the low-8-bit prefix the old single-block join
    keyed on."""
    for k in (1, 2, 3):
        got = {
            (r.a, r.b, r.hamming)
            for r in dedup.simhash_candidates(doc_df, max_hamming=k).collect()
        }
        want = _brute_force_hamming_pairs(spark, doc_df, k)
        assert got == want, f"max_hamming={k}: {got ^ want}"


def test_simhash_finds_pair_differing_in_low_prefix(spark):
    """Adversarial regression for the old single-prefix-block join: craft a
    corpus where a genuine near-dup pair's signatures differ ONLY inside
    the low 8 bits, and assert the pair is still a candidate."""
    base = " ".join(f"token{i}" for i in range(40))
    rows = [(i, f"{base} filler {i * 13}") for i in range(10)]
    # near-identical pair: same long body, tiny perturbation
    rows.append((200, base + " zz"))
    rows.append((201, base + " zq"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {
        r.doc_id: r.sh
        for r in df.select(
            "doc_id", dedup.shingle_hashes("text").alias("__shh")
        )
        .select("doc_id", dedup.simhash_pandas("__shh").alias("sh"))
        .collect()
    }
    ham = bin((sig[200] ^ sig[201]) & 0xFFFFFFFF).count("1")
    got = {
        (r.a, r.b)
        for r in dedup.simhash_candidates(df, max_hamming=max(ham, 1)).collect()
    }
    assert (200, 201) in got
    # the exhaustive check: whatever bits differ, candidates == brute force
    want = {
        (a, b) for a, b, _ in _brute_force_hamming_pairs(spark, df, max(ham, 1))
    }
    assert got == want


def test_simhash_dedup_pipeline(spark, doc_df, caplog):
    """Candidates -> connected components -> min-id survivor; census
    surfacing mirrors minhash_dedup."""
    import logging

    out = dedup.simhash_dedup(doc_df, max_hamming=2)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert 0 in ids  # min id of its near-dup component survives
    assert not {100, 101} <= ids  # its clones were dropped
    degenerate = [(i, "identical boilerplate text repeated everywhere") for i in range(300)]
    df = spark.createDataFrame(degenerate, "doc_id long, text string")
    with caplog.at_level(logging.WARNING, logger="samza_spark.pipeline.dedup"):
        dedup.simhash_dedup(df, max_hamming=2, max_block_size=50).count()
    assert any("hot-bucket cap dropped" in r.message for r in caplog.records)


def test_simhash_64bit_scale_path(spark, doc_df):
    """bits=64 is the documented corpus-scale configuration (16-bit
    blocks at k=3 -> 4 x 65,536 buckets instead of 4 x 256): the planted
    near-dups must still surface, pairs == brute force at the same
    width, and signatures must use the high bits (sign-extension safe)."""
    got = {
        (r.a, r.b)
        for r in dedup.simhash_candidates(doc_df, max_hamming=3, bits=64).collect()
    }
    assert any(a == 0 and b in (100, 101) for a, b in got)
    sig = df_sig = (
        doc_df.select("doc_id", dedup.shingle_hashes("text").alias("__shh"))
        .select("doc_id", dedup.simhash_pandas("__shh", bits=64).alias("sh"))
    )
    sigs = [r.sh for r in df_sig.collect()]
    assert any(s < 0 or s > 0xFFFFFFFF for s in sigs)  # high bits in use
    l, r = sig.alias("l"), sig.alias("r")
    brute = {
        (row.a, row.b)
        for row in l.join(r, F.col("l.doc_id") < F.col("r.doc_id"))
        .withColumn("h", F.expr("bit_count(l.sh ^ r.sh)"))
        .filter(F.col("h") <= 3)
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .collect()
    }
    assert got == brute


def test_simhash_blocks_cover_all_bits():
    for bits in (32, 64):
        for k in (1, 2, 3, 5):
            blocks = dedup.simhash_blocks(bits, k)
            assert len(blocks) == k + 1
            covered = []
            for off, w in blocks:
                assert w >= 1
                covered.extend(range(off, off + w))
            assert sorted(covered) == list(range(bits))


def test_lsh_short_and_empty_docs_batch_independent(spark):
    """Regression: docs shorter than the ngram width (and empty docs) must
    hash to the same band buckets regardless of their Arrow-batch neighbors
    — partial windows are sentinel-padded, never read the next doc's words.
    Identical short docs therefore ALWAYS become candidate pairs."""
    rows = [
        (0, "tiny"),            # 1 word < ngram=3
        (1, "big neighbor document with many distinct words flooding the flat batch"),
        (2, "tiny"),            # identical to 0, different neighbor context
        (3, ""),                # empty doc
        (4, "totally different neighbor text so batches differ in content"),
        (5, ""),                # identical-empty, different neighbor
        (6, "two words"),       # 2 words < ngram=3
        (7, "another large filler document to shift flat offsets around again"),
        (8, "two words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.minhash_lsh_candidates(df, num_perm=32, bands=16)
    got = {(r.a, r.b) for r in pairs.collect()}
    assert (0, 2) in got, f"identical short docs missed: {got}"
    assert (3, 5) in got, f"identical empty docs missed: {got}"
    assert (6, 8) in got, f"identical 2-word docs missed: {got}"
    # and a single-partition run gives the same signatures as multi-partition
    pairs1 = dedup.minhash_lsh_candidates(df.coalesce(1), num_perm=32, bands=16)
    assert {(r.a, r.b) for r in pairs1.collect()} == got


def test_lsh_hot_bucket_guard(spark):
    """Skew stress: thousands of identical docs collapse into ONE bucket
    per band — uncapped that is a quadratic straggler task (5k docs =
    12.5M pairs x bands). The guard drops oversized buckets (reported via
    lsh_capped_buckets) while normal near-dup pairs still come through."""
    degenerate = [(i, "identical boilerplate text repeated everywhere") for i in range(5000)]
    normal = [
        (100000, "the quick brown fox jumps over the lazy dog today"),
        (100001, "the quick brown fox jumps over the lazy dog today!"),
    ]
    df = spark.createDataFrame(degenerate + normal, "doc_id long, text string")
    pairs = dedup.minhash_lsh_candidates(df, num_perm=32, bands=16, max_bucket_size=100)
    got = {(r.a, r.b) for r in pairs.collect()}
    assert (100000, 100001) in got  # normal near-dups unaffected
    assert not any(a < 5000 and b < 5000 for a, b in got)  # hot bucket dropped
    capped = dedup.lsh_capped_buckets(
        df, num_perm=32, bands=16, max_bucket_size=100
    ).collect()
    assert len(capped) >= 16  # one per band for the degenerate cluster
    assert all(r.n_ids == 5000 for r in capped)
    # simhash has the analogous block guard
    sim = dedup.simhash_candidates(df, max_hamming=2, max_block_size=100)
    sgot = {(r.a, r.b) for r in sim.collect()}
    assert not any(a < 5000 and b < 5000 for a, b in sgot)


def test_dedup_pipelines_surface_capped_buckets(spark, caplog):
    """The end-to-end dedup pipelines must not silently skip a capped
    boilerplate cluster: census rows come back from the shared bucket
    aggregation, the default logs a WARNING, and on_capped='raise'
    fails the job."""
    import logging

    import pytest

    degenerate = [(i, "identical boilerplate text repeated everywhere") for i in range(500)]
    normal = [
        (100000, "the quick brown fox jumps over the lazy dog today"),
        (100001, "the quick brown fox jumps over the lazy dog today!"),
    ]
    df = spark.createDataFrame(degenerate + normal, "doc_id long, text string")
    pairs, census = dedup.minhash_lsh_candidates_with_census(
        df, num_perm=32, bands=16, max_bucket_size=100
    )
    crows = census.collect()
    assert len(crows) >= 16 and all(r.n_ids == 500 for r in crows)
    assert (100000, 100001) in {(r.a, r.b) for r in pairs.collect()}
    with caplog.at_level(logging.WARNING, logger="samza_spark.pipeline.dedup"):
        out = dedup.minhash_dedup(df, threshold=0.7, max_bucket_size=100)
        out.count()
    assert any("hot-bucket cap dropped" in rec.message for rec in caplog.records)
    with pytest.raises(RuntimeError, match="hot-bucket cap dropped"):
        dedup.minhash_dedup_cc(df, max_bucket_size=100, on_capped="raise")
    # a clean corpus stays silent
    caplog.clear()
    clean = spark.createDataFrame(normal, "doc_id long, text string")
    with caplog.at_level(logging.WARNING, logger="samza_spark.pipeline.dedup"):
        dedup.minhash_dedup(clean, threshold=0.7, max_bucket_size=100).count()
    assert not any("hot-bucket" in rec.message for rec in caplog.records)


def test_minhash_signature_empty_docs_zeroed(spark):
    """Empty shingle arrays must produce the all-zero signature, not the
    next doc's reduceat value (and a trailing empty doc must not raise)."""
    df = spark.createDataFrame(
        [(0, [11, 22, 33]), (1, []), (2, [44, 55]), (3, [])],
        "doc_id long, shh array<bigint>",
    ).coalesce(1)
    out = df.select(
        "doc_id", dedup.minhash_signature_pandas("shh", num_perm=8).alias("sig")
    ).collect()
    by_id = {r.doc_id: r.sig for r in out}
    assert by_id[1] == [0] * 8 and by_id[3] == [0] * 8
    assert by_id[0] != [0] * 8 and by_id[2] != [0] * 8


def test_cosine_topk_matches_numpy(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    out = similarity.cosine_topk(df, df.filter("vec_id = 0"), k=5).collect()
    got = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    # numpy ground truth
    v = vecs.astype(np.float64)
    sims = (v @ v[0]) / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[0]))
    sims[0] = -np.inf
    expect = list(np.argsort(-sims)[:5])
    assert got == expect


def test_ann_topk_recall(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    # make vec 1 a near-clone of vec 0 so its bucket must match
    vecs[1] = vecs[0] + 0.01 * rng.standard_normal(16).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    out = similarity.ann_topk(df, df.filter("vec_id = 0"), k=5, n_planes=4).collect()
    assert any(r.neighbor_id == 1 for r in out)


def test_ann_multi_probe_improves_recall(spark):
    """Flip-1-bit multi-probe must recover neighbors a near-hyperplane
    query loses, and never reduce recall vs single-probe. Measured on this
    clustered corpus (20 clusters, 300 vectors, 20 queries, n_planes=8):
    recall@10 0.295 -> 0.78 for the xxhash planes and 0.46 -> 0.83 for the
    deterministic oracle planes."""
    rng = np.random.default_rng(23)
    centers = rng.standard_normal((20, 16))
    rows = [
        (i, [float(x) for x in centers[i % 20] + 0.25 * rng.standard_normal(16)])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter("vec_id < 20")
    exact = similarity.cosine_topk(df, queries, k=10).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(rows):
        got = {}
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        per_q = [
            len(got.get(qid, set()) & t) / len(t) for qid, t in truth.items()
        ]
        return sum(per_q) / len(per_q)

    single = recall(
        similarity.ann_topk(df, queries, k=10, n_planes=8, multi_probe=False).collect()
    )
    multi = recall(
        similarity.ann_topk(df, queries, k=10, n_planes=8, multi_probe=True).collect()
    )
    assert multi >= single + 0.2, (single, multi)
    assert multi >= 0.7, (single, multi)
    # the exact (oracle) variant probes the same way
    multi_det = recall(
        similarity.ann_topk_exact(
            df, queries, k=10, n_planes=8, dim=16, multi_probe=True
        ).collect()
    )
    single_det = recall(
        similarity.ann_topk_exact(
            df, queries, k=10, n_planes=8, dim=16, multi_probe=False
        ).collect()
    )
    assert multi_det >= single_det
    assert multi_det >= 0.7, (single_det, multi_det)


def test_quantized_rerank_recall(spark):
    """int8 quantize -> integer-cosine shortlist -> float rerank: int8
    barely perturbs cosine ordering, so recall@10 vs the exact baseline
    should be near-perfect with a 3x shortlist."""
    rng = np.random.default_rng(31)
    vecs = rng.standard_normal((250, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(250)],
        "vec_id long, embedding array<float>",
    )
    queries = df.filter("vec_id < 10")
    truth = {}
    for r in similarity.cosine_topk(df, queries, k=10).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in similarity.quantized_topk(df, queries, k=10, rerank_factor=3).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(got.get(q, set()) & t) / len(t) for q, t in truth.items()]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_embedding_near_dup_pairs(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((30, 8)).astype(np.float32)
    vecs[7] = vecs[3] * 1.001  # near-identical direction -> cosine ~ 1
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    out = dedup.embedding_near_dup(df, threshold=0.95)
    assert (3, 7) in {(r.a, r.b) for r in out.collect()}


def test_repetition_metrics(spark):
    df = spark.createDataFrame(
        [
            (1, "same line\nsame line\nsame line\nunique"),
            (2, "read more...\nok\nread on..."),
            (3, "#### $$$$ @@@"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in text.repetition_metrics(df).collect()}
    assert abs(got[1].dup_line_frac - 0.5) < 1e-12  # 2 distinct of 4
    assert got[1].ellipsis_line_frac == 0.0
    assert abs(got[2].ellipsis_line_frac - 2 / 3) < 1e-12
    assert got[3].symbol_ratio > 0.8
    assert got[4].dup_line_frac == 0.0 and got[4].mean_word_len == 0.0


def test_dataset_shaping_invariants(spark):
    """Split proportions ~98/1/1, assignment stable across corpora,
    stratified sample keeps only the asked fractions, and packing bins
    never exceed budget by more than one document."""
    from samza_spark.pipeline import sampling

    rows = [(i, "en" if i % 3 else "de", 100 + (i * 37) % 900) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars int")
    split = sampling.assign_split(df)
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert 0.95 < counts["train"] / 4000 < 1.0
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0
    # stability: the same ids in a different (smaller) corpus get the SAME split
    sub = sampling.assign_split(df.filter("doc_id < 100"))
    full_map = {r.doc_id: r["split"] for r in split.filter("doc_id < 100").collect()}
    assert {r.doc_id: r["split"] for r in sub.collect()} == full_map

    kept = sampling.stratified_sample(df, {"en": 0.5}, "lang", default_fraction=1.0)
    n_en_all = df.filter("lang = 'en'").count()
    n_en_kept = kept.filter("lang = 'en'").count()
    assert 0.4 < n_en_kept / n_en_all < 0.6
    assert kept.filter("lang = 'de'").count() == df.filter("lang = 'de'").count()

    packed = sampling.pack_contiguous(df, "n_chars", budget=2000, n_shards=4)
    per_bin = (
        packed.groupBy("shard", "bin")
        .agg(F.sum("n_chars").alias("tot"), F.max("n_chars").alias("mx"))
        .collect()
    )
    assert all(r.tot <= 2000 + r.mx for r in per_bin)  # overshoot <= one doc
    # bins are contiguous non-negative ints per shard
    for r in (
        packed.groupBy("shard").agg(F.expr("array_sort(collect_set(bin))").alias("bins")).collect()
    ):
        assert r.bins == list(range(len(r.bins)))


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "write to bob.smith+x@corp.co.uk today"),
            (2, "see https://a.b/c?q=1#frag now"),
            (3, "call +44-020-7946-0958 or 555-867-5309"),
            (4, "card 4111 1111 1111 1111 expires"),
            (5, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.clean for r in df.select(
        "doc_id", text.redact_pii(F.col("text")).alias("clean")
    ).collect()}
    assert got[1] == "write to <EMAIL> today"
    assert got[2] == "see <URL> now"
    assert "<PHONE>" in got[3] and "0958" not in got[3] and "5309" not in got[3]
    assert got[4] == "card <CARD> expires"
    assert got[5] == "nothing sensitive here"


def test_text_profile_metrics(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog sat in the house"),
            (2, "der Hund und die Katze sind nicht da"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.text_profile(df).collect()}
    assert out[1].n_tokens == 9 and out[1].lang_pred == "en"
    assert out[2].lang_pred == "de"
    assert out[3].n_tokens == 0 and out[3].lang_pred == "und"
    assert 0.0 <= out[1].quality <= 1.0
    assert len(out[1].fp) == 32  # md5 hex


def test_rolling_fingerprint_stable_under_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "hello world foo"), (2, "HELLO   world foo"), (3, "other text")],
        "id long, text string",
    )
    out = {r.id: r.rfp for r in df.select("id", text.rolling_fingerprint("text").alias("rfp")).collect()}
    assert out[1] == out[2] != out[3]


def test_multimodal_image_plumbing(spark):
    df = spark.createDataFrame(
        [(1, b"fake-image-bytes"), (2, b"other-bytes")], "id long, content binary"
    )
    with_meta = attach_meta(df, "content", kind="image", mime="image/png")
    meta = {r.id: r.mm_meta for r in with_meta.collect()}
    assert meta[1].n_bytes == 16 and meta[1].kind == "image"
    decoded = decode_image(with_meta, "content", dim=8, fake=True)
    rows = {r.id: r for r in decoded.collect()}
    assert len(rows[1].feat) == 8 and rows[1].channels == 3
    # deterministic: same bytes -> same features
    again = {r.id: r for r in decode_image(with_meta, "content", dim=8, fake=True).collect()}
    assert rows[1].feat == again[1].feat
    assert "content" not in decoded.columns  # blob projected away post-decode


def test_multimodal_audio_plumbing(spark):
    df = spark.createDataFrame([(1, b"\x00" * 64)], "id long, content binary")
    out = sample_audio_frames(df, "content", dim=4, fake=True).collect()
    assert out[0].sample_rate == 16000 and len(out[0].feat) == 4


def test_multimodal_resize_and_video_frames(spark):
    from samza_spark.pipeline.multimodal import (
        attach_meta,
        resize_image,
        sample_video_frames,
    )

    df = spark.createDataFrame(
        [(1, b"x" * 1000), (2, b"y" * 4000)], "id int, content binary"
    )
    resized = resize_image(attach_meta(df, "content"), "content", width=64, height=64)
    rows = {r.id: r.content for r in resized.collect()}
    assert set(rows) == {1, 2}
    assert all(isinstance(v, (bytes, bytearray)) and len(v) > 0 for v in rows.values())
    # deterministic: same input -> same bytes
    again = {r.id: r.content for r in resize_image(
        attach_meta(df, "content"), "content", width=64, height=64).collect()}
    assert rows == again

    vids = sample_video_frames(df, "content", every_n=10, dim=8)
    out = {r.id: r for r in vids.collect()}
    # frame count derives from blob size: 1000//16=62 frames -> ceil(62/10)=7
    assert out[1].n_frames == 7
    assert out[2].n_frames == 25
    assert len(out[1].frame_feats) == 7 and len(out[1].frame_feats[0]) == 8


def test_avro_gate_raises_helpfully(spark, tmp_path):
    from samza_spark.sources import FileSource

    with pytest.raises((NotImplementedError, Exception)) as ei:
        FileSource(str(tmp_path), fmt="avro", schema="a int").read(spark).df.collect()
    assert "avro" in str(ei.value).lower()


def test_connected_components_transitive(spark):
    from samza_spark.pipeline.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (4, 5), (5, 6), (6, 40)], "a bigint, b bigint"
    )
    comp = {r.doc_id: r.component for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7, 4: 4, 5: 4, 6: 4, 40: 4}


def test_minhash_dedup_cc_matches_greedy_on_doc_corpus(spark, doc_df):
    from samza_spark.pipeline import dedup

    greedy = dedup.minhash_dedup(doc_df, threshold=0.7, num_perm=32, bands=8)
    cc = dedup.minhash_dedup_cc(doc_df, threshold=0.7, num_perm=32, bands=8)
    kept_g = {r.doc_id for r in greedy.select("doc_id").collect()}
    kept_c = {r.doc_id for r in cc.select("doc_id").collect()}
    # CC keeps exactly one per component; greedy may keep fewer reps is
    # impossible (it drops strictly the b-side) — CC kept-set is a subset
    assert kept_c <= kept_g
    assert len(kept_c) >= 1


def test_ivf_topk_recall(spark):
    """IVF ANN: recall@10 vs exact top-k on clustered synthetic vectors."""
    import numpy as np

    from samza_spark.pipeline.similarity import cosine_topk, ivf_topk

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((8, 16))
    rows = []
    for i in range(400):
        c = centers[i % 8]
        v = c + 0.15 * rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    queries = emb.filter("vec_id < 4")
    exact = cosine_topk(emb, queries, k=10).collect()
    approx = ivf_topk(emb, queries, k=10, n_lists=8, n_probe=3).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_ivf_exact_assign_has_no_window_shuffle(spark):
    """The oracle-path IVF assignment must be a map-only array expression:
    exactly ONE Window in the whole plan (the final per-query rank), not
    one per assign stage — the old crossJoin+row_number shuffled
    corpus×n_lists rows through a window sort."""
    import numpy as np

    from samza_spark.pipeline.similarity import ivf_topk_exact

    rng = np.random.default_rng(5)
    rows = [
        (i, [float(x) for x in rng.standard_normal(16)]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = ivf_topk_exact(emb, emb.filter("vec_id < 3"), k=5, n_lists=4, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # "Window [" is the operator; WindowGroupLimit is the rank-pushdown
    # optimization and fine to see
    assert plan.count("Window [") == 1, plan
    assert out.count() > 0
    """Invariants over 300 seeded-random strings (unicode, whitespace runs,
    punctuation, empties): quality in [0,1], token_count matches Python
    str.split, lang_id stays in its domain, identical normalized text =>
    identical fingerprint and minhash signature."""
    import random
    import string

    from samza_spark.pipeline import text as T

    rng = random.Random(0xC0FFEE)
    alphabet = string.ascii_letters + string.digits + " .,!?;:\t\néü中"
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
        for _ in range(300)
    ] + ["", " ", "\t\n", "the the the", "a  b   c"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    rows = T.text_profile(df).collect()
    for r in rows:
        assert 0.0 <= r.quality <= 1.0, (r.doc_id, r.quality)
        assert r.n_tokens == len(texts[r.doc_id].split()), r.doc_id
        assert r.lang_pred in {"en", "de", "es", "fr", "und"}
    # same normalized content -> same fingerprint
    from pyspark.sql import functions as F

    dup = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "HELLO\tWORLD")],
        "doc_id bigint, text string",
    )
    fps = {r.fp for r in dup.select(T.fingerprint(F.col("text")).alias("fp")).collect()}
    assert len(fps) == 1
    rfps = {
        r.rfp
        for r in dup.select(T.rolling_fingerprint("text").alias("rfp")).collect()
    }
    assert len(rfps) == 1


def test_embedding_quantization_error_bound(spark):
    """int8 quantization: reconstruction error per element is <= scale/2,
    and dequantized cosine stays within ~1% of the float cosine."""
    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.standard_normal(32)]) for i in range(50)]
    rows.append((98, [0.0] * 32))  # zero vector edge case
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.quantize_embeddings(df).collect()
    by_id = {r.vec_id: r for r in out}
    assert by_id[98].scale == 0.0 and all(q == 0 for q in by_id[98].q)
    for r in out:
        if r.vec_id == 98:
            continue
        v = np.array(dict(rows)[r.vec_id])
        deq = np.array(r.q, dtype=np.float64) * r.scale
        assert np.max(np.abs(v - deq)) <= r.scale / 2 + 1e-12
        assert np.max(np.abs(np.array(r.q))) <= 127
        cos_f = v @ v / (np.linalg.norm(v) ** 2)  # trivially 1; use a probe
    # cross-vector cosine preservation on a sample pair
    a, b = np.array(rows[0][1]), np.array(rows[1][1])
    qa, qb = by_id[0], by_id[1]
    da = np.array(qa.q) * qa.scale
    db = np.array(qb.q) * qb.scale
    cf = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    cq = da @ db / (np.linalg.norm(da) * np.linalg.norm(db))
    assert abs(cf - cq) < 0.01


# ---------------------------------------------------------------------------
# round 4: duplicate n-gram spans, SemDeDup, Naive Bayes classifier
# ---------------------------------------------------------------------------


def test_duplicate_ngram_stats_planted_span(spark):
    from samza_spark.pipeline import substring

    span = "alpha beta gamma delta"  # 4 tokens, shared verbatim by docs 1+2
    rows = [
        (1, f"one two three {span} four five six"),
        (2, f"seven eight {span} nine ten eleven twelve"),
        (3, "totally unrelated words appear only here once ever"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in substring.duplicate_ngram_stats(df, n=4, min_count=2).collect()
    }
    # exactly the shared 4-gram duplicates; its 4 tokens are covered
    assert out[1].n_dup_grams == 1 and out[1].dup_tokens == 4
    assert out[2].n_dup_grams == 1 and out[2].dup_tokens == 4
    assert out[3].n_dup_grams == 0 and out[3].dup_tokens == 0
    # clean_text drops exactly the span, keeps order
    assert out[1].clean_text == "one two three four five six"
    assert out[2].clean_text == "seven eight nine ten eleven twelve"
    assert out[3].clean_text == rows[2][1]
    assert out[1].dup_frac == pytest.approx(4 / 10)


def test_duplicate_ngram_within_one_doc_counts(spark):
    from samza_spark.pipeline import substring

    # the Lee et al. definition: a window repeated WITHIN one document is
    # duplicated too
    df = spark.createDataFrame(
        [(1, "a b c d x y z a b c d"), (2, "nothing shared here at all")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in substring.duplicate_ngram_stats(df, n=4, min_count=2).collect()
    }
    assert out[1].n_dup_grams == 2  # 'a b c d' at pos 1 and pos 8
    assert out[1].dup_tokens == 8
    assert out[1].clean_text == "x y z"


def test_remove_duplicate_spans_drops_mostly_dup_docs(spark):
    from samza_spark.pipeline import substring

    boiler = "terms of service apply to all visitors"
    df = spark.createDataFrame(
        [
            (1, f"{boiler} extra words making real content here now"),
            (2, boiler),
            (3, boiler),
        ],
        "doc_id long, text string",
    )
    out = substring.remove_duplicate_spans(df, n=4, max_dup_frac=0.9)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1}  # docs 2/3 are 100% duplicated spans
    assert "terms" not in rows[1].text and "extra" in rows[1].text


def test_semantic_dedup_drops_planted_near_identical(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(30, 8)).astype("float32")
    vecs = [(i, base[i].tolist()) for i in range(30)]
    # planted: 100 is a tiny perturbation of 0 -> cosine ~1
    vecs.append((100, (base[0] + 1e-4).tolist()))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {
        r.vec_id: r
        for r in similarity.semantic_dedup(df, n_lists=4, tau=0.95).collect()
    }
    assert out[0].keep is True  # min-id representative wins
    assert out[100].keep is False and out[100].n_dups >= 1
    assert out[100].max_dup_sim > 0.999
    assert out[100].list_id == out[0].list_id
    # unrelated gaussian vectors survive
    assert sum(1 for r in out.values() if not r.keep) == 1


def test_semantic_dedup_fast_path_agrees(spark):
    rng = np.random.default_rng(11)
    base = rng.normal(size=(20, 8)).astype("float32")
    vecs = [(i, base[i].tolist()) for i in range(20)]
    vecs.append((50, (base[3] * 1.001).tolist()))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    exact = similarity.semantic_dedup(df, n_lists=4, tau=0.95, exact=True)
    fast = similarity.semantic_dedup(df, n_lists=4, tau=0.95, exact=False)
    assert {(r.vec_id, r.keep) for r in exact.collect()} == {
        (r.vec_id, r.keep) for r in fast.collect()
    }


def test_nb_classifier_learns_separable_langs(spark):
    rows = []
    en = "the cat sat on the mat and the dog ran"
    de = "der hund lief und die katze sass auf der matte"
    for i in range(10):
        rows.append((i, f"{en} {i}", "en"))
        rows.append((100 + i, f"{de} {i}", "de"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = text.nb_lang_classifier(df).collect()
    assert len(out) == 20
    acc = sum(1 for r in out if r.correct) / len(out)
    assert acc == 1.0  # fully separable vocabularies
    for r in out:
        assert r.pred == r.lang
        assert r.score < 0.0  # log-probabilities


# ---------------------------------------------------------------------------
# round 4: corpus governance + incremental dedup
# ---------------------------------------------------------------------------


def test_source_stats_exact_volumes(spark):
    from samza_spark.pipeline import governance

    rows = [
        (1, "one two three", "en", "a"),
        (2, "four five", "de", "a"),
        (3, "six seven eight nine", "en", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r.source: r for r in governance.source_stats(df).collect()}
    assert out["a"].n_docs == 2 and out["a"].n_langs == 2
    assert out["a"].n_tokens == 5 and out["a"].min_doc_id == 1
    assert out["a"].n_chars == len(rows[0][1]) + len(rows[1][1])
    assert out["b"].n_docs == 1 and out["b"].n_tokens == 4


def test_cap_per_source_two_phase_matches_single(spark):
    from samza_spark.pipeline import governance

    rows = [
        (i, f"doc {i} " + "word " * (i % 17), f"src{i % 3}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    single = governance.cap_per_source(df, max_docs=5, n_salts=1)
    salted = governance.cap_per_source(df, max_docs=5, n_salts=4)
    key = lambda d: {(r.source, r.doc_id, r.src_rank) for r in d.collect()}
    assert key(single) == key(salted)
    # every source capped at 5, ranks are 1..k
    per_src = {}
    for r in single.collect():
        per_src.setdefault(r.source, []).append(r.src_rank)
    for src, ranks in per_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_cap_per_source_prefers_quality(spark):
    from samza_spark.pipeline import governance

    # doc 2 is long/high-quality, doc 1 is junk — cap of 1 keeps doc 2
    rows = [
        (1, "!!!! ???? ;;;;", "s"),
        (2, "a perfectly reasonable sentence with many alphabetic words here", "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = governance.cap_per_source(df, max_docs=1).collect()
    assert len(kept) == 1 and kept[0].doc_id == 2 and kept[0].src_rank == 1


def test_dedup_against_reference_flags(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today now"
    reference = spark.createDataFrame(
        [(10, base), (11, "completely different reference content about databases")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (20, base.upper()),                # exact dup of ref 10 (normalized)
            (21, base + " extra"),             # near dup of ref 10
            (22, "novel text that matches nothing in the reference corpus"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup.dedup_against_reference(
            batch, reference, threshold=0.7, num_perm=32, bands=16
        ).collect()
    }
    assert out[20].exact_dup and out[20].exact_ref_id == 10
    assert out[21].near_dup and out[21].near_ref_id == 10
    assert out[21].best_jaccard > 0.7
    assert not out[22].exact_dup and not out[22].near_dup
    assert out[22].exact_ref_id is None and out[22].best_jaccard is None


def test_dedup_against_reference_no_within_side_pairs(spark):
    # two identical docs INSIDE the batch must not flag each other —
    # only batch-vs-reference pairs count
    batch = spark.createDataFrame(
        [(1, "same text repeated in the new batch twice over here"),
         (2, "same text repeated in the new batch twice over here")],
        "doc_id long, text string",
    )
    reference = spark.createDataFrame(
        [(50, "reference corpus has nothing like those batch documents")],
        "doc_id long, text string",
    )
    out = dedup.dedup_against_reference(batch, reference, threshold=0.5).collect()
    assert all(not r.exact_dup and not r.near_dup for r in out)


def test_dedup_against_reference_string_ids(spark):
    # regression (r4 ADVICE): cast(substr(sid,3) as long) NULLed out
    # non-numeric ids, silently dropping every near-dup pair — string ids
    # must flow through the candidate/verify joins untouched
    base = "the quick brown fox jumps over the lazy dog and runs far away today now"
    reference = spark.createDataFrame(
        [("ref-a", base), ("ref-b", "completely different reference content about databases")],
        "doc_id string, text string",
    )
    batch = spark.createDataFrame(
        [
            ("new-x", base.upper()),
            ("new-y", base + " extra"),
            ("new-z", "novel text that matches nothing in the reference corpus"),
        ],
        "doc_id string, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup.dedup_against_reference(
            batch, reference, threshold=0.7, num_perm=32, bands=16
        ).collect()
    }
    assert out["new-x"].exact_dup and out["new-x"].exact_ref_id == "ref-a"
    assert out["new-y"].near_dup and out["new-y"].near_ref_id == "ref-a"
    assert out["new-y"].best_jaccard > 0.7
    assert not out["new-z"].exact_dup and not out["new-z"].near_dup


def test_corpus_index_flags_match_recompute(spark):
    # the persisted-index path must produce the identical flag rows as the
    # band-everything-together recompute path
    from samza_spark.pipeline.dedup import CorpusDedupIndex

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    reference = docs.filter(F.col("doc_id") % 2 == 0)
    idx = CorpusDedupIndex(spark, num_perm=64, bands=16).add(reference)
    got = sorted(
        tuple(r) for r in idx.flags(batch, reference, threshold=0.8).collect()
    )
    want = sorted(
        tuple(r)
        for r in dedup.dedup_against_reference(
            batch, reference, threshold=0.8, num_perm=64, bands=16
        ).collect()
    )
    assert got == want


def test_streaming_corpus_ingest_bands_batch_only(spark, tmp_path, monkeypatch):
    # batch 2+ must band ONLY the incoming batch: the accumulated corpus
    # is served from the persisted index, never re-fingerprinted
    from samza_spark.pipeline import dedup as dedup_mod
    from samza_spark.pipeline.dedup import streaming_corpus_ingest
    from samza_spark.sources import FileSource
    from samza_spark.tables.local import LocalTable

    banded_sizes = []
    real = dedup_mod._lsh_banded

    def probe(df, *args, **kwargs):
        banded_sizes.append(df.count())
        return real(df, *args, **kwargs)

    monkeypatch.setattr(dedup_mod, "_lsh_banded", probe)

    d = tmp_path / "ingest_probe"
    d.mkdir()
    base = "the quick brown fox jumps over the lazy dog and runs far away today now"
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(1, base), (2, "unrelated second document about completely other things"),
         (3, "third seed document with its own distinct content words")],
        schema,
    ).write.parquet(str(d / "f1"))
    reference = LocalTable(spark.createDataFrame([], schema), key_cols=["doc_id"])
    q = streaming_corpus_ingest(
        FileSource(f"{d}/*", schema=schema).read_stream(spark),
        reference, threshold=0.7, num_perm=32, bands=16,
    )
    try:
        q.processAllAvailable()
        assert sorted(r.doc_id for r in reference.df.collect()) == [1, 2, 3]
        banded_sizes.clear()
        spark.createDataFrame(
            [(10, base), (11, "a genuinely fresh document body appearing in batch two")],
            schema,
        ).write.parquet(str(d / "f2"))
        q.processAllAvailable()
        assert sorted(r.doc_id for r in reference.df.collect()) == [1, 2, 3, 11]
        # every banding call in batch 2 saw at most the 2 batch docs; the
        # round-4 shape banded corpus+batch together (5 rows)
        assert banded_sizes and max(banded_sizes) <= 2, banded_sizes
    finally:
        q.stop()


def test_streaming_corpus_ingest_durable_index_restart(spark, tmp_path):
    # with index_path, the LSH index restores across sessions: the
    # pre-restart corpus is NOT re-banded at stream start, and dups of
    # pre-restart docs are still caught
    from samza_spark.pipeline import dedup as dedup_mod
    from samza_spark.pipeline.dedup import streaming_corpus_ingest
    from samza_spark.sources import FileSource
    from samza_spark.tables.local import DurableLocalTable

    d = tmp_path / "ingest_durable"
    d.mkdir()
    wh, ixp = str(tmp_path / "corpus_wh_ix"), str(tmp_path / "lsh_ix")
    base = "the quick brown fox jumps over the lazy dog and runs far away today now"
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(1, base), (2, "other content unrelated to anything else written")], schema
    ).write.parquet(str(d / "f1"))
    ref = DurableLocalTable.open(spark, wh, ["doc_id"], schema=schema)
    q = streaming_corpus_ingest(
        FileSource(f"{d}/*", schema=schema).read_stream(spark),
        ref, threshold=0.7, num_perm=32, bands=16, index_path=ixp,
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(r.doc_id for r in ref.df.collect()) == [1, 2]

    # "restart": fresh table objects restore corpus AND index; the
    # restored index must skip the bootstrap banding of the corpus
    ref2 = DurableLocalTable.open(spark, wh, ["doc_id"])
    idx2 = dedup_mod.CorpusDedupIndex(spark, num_perm=32, bands=16, path=ixp)
    assert not idx2.is_empty()
    spark.createDataFrame(
        [(10, base.upper()), (11, "genuinely novel third document body here")], schema
    ).write.parquet(str(d / "f2"))
    q2 = streaming_corpus_ingest(
        FileSource(f"{d}/*", schema=schema).read_stream(spark),
        ref2, threshold=0.7, num_perm=32, bands=16, index=idx2,
    )
    try:
        q2.processAllAvailable()
        assert sorted(r.doc_id for r in ref2.df.collect()) == [1, 2, 11]
    finally:
        q2.stop()


def test_bigram_logprob_hand_model(spark):
    import math

    # corpus: "a b a" and "b a" -> unigrams: a=3, b=2, total=5
    # bigrams: (a,b)=1, (b,a)=2 -> contexts: a=1, b=2
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b a")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in text.bigram_logprob(df).collect()}
    m = lambda p: math.floor(math.log(p) * 1e6)
    # doc 1: ln(3/5) + ln(1/1) + ln(2/2)
    assert out[1].logprob_micro == m(3 / 5) + m(1 / 1) + m(2 / 2)
    assert out[1].n_tokens == 3
    # doc 2: ln(2/5) + ln(2/2)
    assert out[2].logprob_micro == m(2 / 5) + m(2 / 2)
    assert out[2].avg_logprob == pytest.approx(out[2].logprob_micro / 1e6 / 2)


def test_bigram_logprob_empty_doc(spark):
    df = spark.createDataFrame(
        [(1, "   "), (2, "hello world hello world")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in text.bigram_logprob(df).collect()}
    assert out[1].n_tokens == 0 and out[1].logprob_micro == 0
    assert out[1].avg_logprob is None
    assert out[2].n_tokens == 4 and out[2].logprob_micro < 0


# ---------------------------------------------------------------------------
# round 4: distributed BPE
# ---------------------------------------------------------------------------


def _bpe_reference(word_freqs, n_merges, min_count=2):
    """Pure-Python Sennrich-style BPE for cross-checking the Spark path."""
    words = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for step in range(1, n_merges + 1):
        pairs = {}
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        if cnt < min_count:
            break
        merges.append((step, l, r, l + r, cnt))
        new_words = {}
        for syms, f in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + f
        words = new_words
    return merges


def test_learn_bpe_matches_reference_impl(spark):
    from samza_spark.pipeline import bpe

    texts = [
        "low lower lowest low low",
        "new newer newest new lower",
        "the newest lowest low new",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    wf = {}
    for t in texts:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    expected = _bpe_reference(wf, n_merges=10)
    got = bpe.learn_bpe(df, n_merges=10, min_count=2)
    assert got == expected


def test_learn_bpe_driver_matches_distributed(spark):
    # the in-memory merge loop (auto path for vocab-sized word tables)
    # must be bit-identical to the per-merge Spark-job loop, eow included
    from samza_spark.pipeline import bpe

    df = spark.createDataFrame(
        [
            (1, "low lower lowest low low new"),
            (2, "new newer newest new lower widest wide"),
            (3, "the newest lowest low new wide wider"),
        ],
        "doc_id long, text string",
    )
    for eow in (None, "\x17"):
        drv = bpe.learn_bpe(df, n_merges=12, min_count=2, eow=eow, impl="driver")
        dist = bpe.learn_bpe(df, n_merges=12, min_count=2, eow=eow, impl="distributed")
        assert drv == dist and len(drv) > 3
    # target_vocab budgeting agrees too
    assert bpe.learn_bpe(df, n_merges=10, target_vocab=16, impl="driver") == (
        bpe.learn_bpe(df, n_merges=10, target_vocab=16, impl="distributed")
    )


def test_bpe_strips_separator_chars(spark):
    # \x1f is not regex \s, so normalization used to preserve it — input
    # containing it corrupted the double-separator symbol encoding.
    # It must now be stripped (and likewise the eow marker char).
    from samza_spark.pipeline import bpe

    clean = spark.createDataFrame(
        [(1, "low lower low low")], "doc_id long, text string"
    )
    dirty = spark.createDataFrame(
        [(1, "l\x1fow lo\x1fwer low low")], "doc_id long, text string"
    )
    assert bpe.learn_bpe(dirty, n_merges=4, min_count=2) == (
        bpe.learn_bpe(clean, n_merges=4, min_count=2)
    )
    merges = bpe.learn_bpe(clean, n_merges=4, min_count=2)
    got_clean = {r.doc_id: r for r in bpe.bpe_tokenize(clean, merges).collect()}
    got_dirty = {r.doc_id: r for r in bpe.bpe_tokenize(dirty, merges).collect()}
    assert got_clean == got_dirty


def test_learn_bpe_overlapping_runs(spark):
    from samza_spark.pipeline import bpe

    # 'aaaa' x3: first merge (a,a) cnt = 3 words * 3 adjacent = 9;
    # greedy application turns aaaa -> (aa, aa), so next pair is (aa, aa)
    df = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa")], "doc_id long, text string"
    )
    got = bpe.learn_bpe(df, n_merges=2, min_count=2)
    assert got[0] == (1, "a", "a", "aa", 9)
    assert got[1] == (2, "aa", "aa", "aaaa", 3)


def test_bpe_tokenize_roundtrip(spark):
    from samza_spark.pipeline import bpe

    df = spark.createDataFrame(
        [(1, "low lower"), (2, ""), (3, "low")], "doc_id long, text string"
    )
    merges = [(1, "l", "o", "lo", 3), (2, "lo", "w", "low", 3)]
    out = {r.doc_id: r for r in bpe.bpe_tokenize(df, merges).collect()}
    assert out[1].bpe_text == "low low e r"
    assert out[1].n_words == 2 and out[1].n_bpe_tokens == 4
    assert out[2].n_words == 0 and out[2].n_bpe_tokens == 0 and out[2].bpe_text == ""
    assert out[3].bpe_text == "low"
    # concatenating subwords reconstructs the normalized text
    assert out[1].bpe_text.replace(" ", "") == "lowlower"


def test_streaming_corpus_ingest_two_batches(spark, tmp_path):
    from samza_spark.pipeline.dedup import streaming_corpus_ingest
    from samza_spark.sources import FileSource
    from samza_spark.tables.local import LocalTable

    d = tmp_path / "ingest"
    d.mkdir()
    base = "the quick brown fox jumps over the lazy dog and runs far away today now"
    schema = "doc_id long, text string"
    # batch 1: two docs (one pair of exact dups inside the batch)
    spark.createDataFrame(
        [(1, base), (2, base.upper()), (3, "something else entirely unrelated here")],
        schema,
    ).write.parquet(str(d / "f1"))
    reference = LocalTable(
        spark.createDataFrame([], schema), key_cols=["doc_id"]
    )
    src = FileSource(f"{d}/*", schema=schema)
    q = streaming_corpus_ingest(
        src.read_stream(spark), reference, threshold=0.7, num_perm=32, bands=16
    )
    try:
        q.processAllAvailable()
        got1 = sorted(r.doc_id for r in reference.df.collect())
        assert got1 == [1, 3]  # 2 was an intra-batch exact dup of 1
        # batch 2: an exact dup of ref 1, a near dup of ref 1, a new doc
        spark.createDataFrame(
            [
                (10, base),
                (11, base + " extra"),
                (12, "fresh new document with completely novel content words"),
            ],
            schema,
        ).write.parquet(str(d / "f2"))
        q.processAllAvailable()
        got2 = sorted(r.doc_id for r in reference.df.collect())
        assert got2 == [1, 3, 12]  # 10 exact-dup, 11 near-dup vs corpus
    finally:
        q.stop()


def test_write_training_shards_layout(spark, tmp_path):
    import os
    from samza_spark.pipeline.sampling import write_training_shards

    df = spark.createDataFrame(
        [(i, f"doc number {i}", (i % 7) + 3) for i in range(200)],
        "doc_id long, text string, n_tokens int",
    )
    out = str(tmp_path / "shards")
    packed = write_training_shards(
        df, out, cost_col="n_tokens", budget=40, n_shards=8
    )
    # one directory per shard, all rows present exactly once
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(dirs) == len({r.shard for r in packed.select("shard").distinct().collect()})
    back = spark.read.parquet(out)
    assert back.count() == 200
    assert sorted(r.doc_id for r in back.collect()) == list(range(200))
    # bins respect the budget up to one boundary-crossing doc
    sums = (
        packed.groupBy("shard", "bin")
        .agg(F.sum("n_tokens").alias("s"), F.max("n_tokens").alias("m"))
        .collect()
    )
    for r in sums:
        assert r.s <= 40 + r.m
    # determinism: re-running produces the identical assignment
    packed2 = write_training_shards(
        df, str(tmp_path / "shards2"), cost_col="n_tokens", budget=40, n_shards=8
    )
    key = lambda d: {(r.doc_id, r.shard, r.bin) for r in d.collect()}
    assert key(packed) == key(packed2)


def test_cap_per_source_hot_domain_skew(spark):
    from samza_spark.pipeline import governance

    # one domain contributes 97% of the corpus — the shape that turns a
    # single-phase per-source window into one straggler sort task
    rows = [(i, f"document body {i} " + "tok " * (i % 23), "hot") for i in range(20000)]
    rows += [(100000 + i, f"cold doc {i} words here", f"cold{i % 5}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = governance.cap_per_source(df, max_docs=10, n_salts=16)
    got = out.groupBy("source").count().collect()
    assert {r.source: r["count"] for r in got}["hot"] == 10
    assert all(r["count"] <= 10 for r in got)
    # identical selection to the unsalted reference on the hot domain
    single = governance.cap_per_source(df.filter(F.col("source") == "hot"), max_docs=10)
    assert {r.doc_id for r in out.filter(F.col("source") == "hot").collect()} == {
        r.doc_id for r in single.collect()
    }


def test_semantic_dedup_hot_cluster_guard(spark, caplog):
    import logging

    rng = np.random.default_rng(3)
    # 60 copies of one vector -> one degenerate cluster; 10 distinct others
    spike = rng.normal(size=8).astype("float32")
    vecs = [(i, (spike + i * 1e-6).tolist()) for i in range(60)]
    vecs += [(200 + i, rng.normal(size=8).astype("float32").tolist()) for i in range(10)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    with caplog.at_level(logging.WARNING, logger="samza_spark.pipeline.similarity"):
        out = similarity.semantic_dedup(
            df, n_lists=4, tau=0.95, max_cluster_size=50
        ).collect()
    assert any("max_cluster_size" in r.message for r in caplog.records)
    by_id = {r.vec_id: r for r in out}
    # spike members conservatively kept (their cluster was skipped)
    assert all(by_id[i].keep for i in range(60))
    assert len(out) == 70


def test_token_mixture_plan_math(spark):
    from samza_spark.pipeline import governance

    # src a: 100 tokens, src b: 300 tokens; targets 50%/50%
    rows = [(i, "tok " * 9 + "tok", "a") for i in range(10)]        # 10 x 10
    rows += [(100 + i, "tok " * 29 + "tok", "b") for i in range(10)]  # 10 x 30
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    plan = {r.source: r for r in governance.token_mixture_plan(
        df, {"a": 5000, "b": 5000}
    ).collect()}
    # T = min(100*10000/5000, 300*10000/5000) = 200 tokens total
    # a: rate = floor(5000*200/100) = 10000 (keep all); b: floor(5000*200/300)=3333
    assert plan["a"].n_tokens == 100 and plan["b"].n_tokens == 300
    assert plan["a"].rate_bp == 10000 and plan["b"].rate_bp == 3333
    assert plan["a"].planned_tokens == 100
    assert plan["b"].planned_tokens == 99  # floor(300*3333/10000)


def test_apply_mixture_plan_rates(spark):
    from samza_spark.pipeline import governance

    rows = [(i, "word " * 10, "a") for i in range(2000)]
    rows += [(10000 + i, "word " * 10, "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    plan = governance.token_mixture_plan(df, {"a": 7500, "b": 2500})
    kept = governance.apply_mixture_plan(df, plan)
    by_src = {r.source: r["count"] for r in kept.groupBy("source").count().collect()}
    # a keeps everything (the binding source); b keeps ~1/3 (2500*T/n)
    assert by_src["a"] == 2000
    assert 550 < by_src["b"] < 800  # rate_bp=3333 -> ~666 expected
    # determinism
    kept2 = governance.apply_mixture_plan(df, plan)
    assert {r.doc_id for r in kept.collect()} == {r.doc_id for r in kept2.collect()}


def test_learn_bpe_eow_marker(spark):
    from samza_spark.pipeline import bpe

    df = spark.createDataFrame(
        [(1, "low low low lower slow slow")], "doc_id long, text string"
    )
    eow = "\x17"
    merges = bpe.learn_bpe(df, n_merges=6, min_count=2, eow=eow)
    # word-final context is learnable: some merge involves the marker
    assert any(eow in (l, r) or (l + r).endswith(eow) for _, l, r, _, _ in merges)
    out = {r.doc_id: r for r in bpe.bpe_tokenize(df, merges, eow=eow).collect()}
    # every word contributes its marker exactly once
    assert out[1].bpe_text.count(eow) == out[1].n_words
    # reconstruction: strip markers, drop spaces -> original normalized text
    assert out[1].bpe_text.replace(" ", "").replace(eow, "") == "lowlowlowlowerslowslow"


def test_streaming_corpus_ingest_survives_restart(spark, tmp_path):
    from samza_spark.pipeline.dedup import streaming_corpus_ingest
    from samza_spark.sources import FileSource
    from samza_spark.tables.local import DurableLocalTable

    d = tmp_path / "ingest2"
    d.mkdir()
    wh = str(tmp_path / "corpus_wh")
    base = "the quick brown fox jumps over the lazy dog and runs far away today now"
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(1, base), (2, "other content unrelated to anything else written")], schema
    ).write.parquet(str(d / "f1"))
    ref = DurableLocalTable.open(spark, wh, ["doc_id"], schema=schema)
    q = streaming_corpus_ingest(
        FileSource(f"{d}/*", schema=schema).read_stream(spark),
        ref, threshold=0.7, num_perm=32, bands=16,
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(r.doc_id for r in ref.df.collect()) == [1, 2]

    # "restart": reopen the warehouse in a fresh table object, resume the
    # ingest stream with a batch containing a dup of pre-restart state
    ref2 = DurableLocalTable.open(spark, wh, ["doc_id"])
    assert sorted(r.doc_id for r in ref2.df.collect()) == [1, 2]
    spark.createDataFrame(
        [(10, base.upper()), (11, "genuinely novel third document body here")], schema
    ).write.parquet(str(d / "f2"))
    q2 = streaming_corpus_ingest(
        FileSource(f"{d}/*", schema=schema).read_stream(spark),
        ref2, threshold=0.7, num_perm=32, bands=16,
    )
    try:
        q2.processAllAvailable()
        got = sorted(r.doc_id for r in ref2.df.collect())
        # 10 is an exact dup of pre-restart doc 1 -> dropped; 11 kept.
        # (1, 2 are re-offered by the fresh stream but dedup'd as exact dups)
        assert got == [1, 2, 11]
    finally:
        q2.stop()


def test_bpe_tokenize_on_a_stream(spark, tmp_path):
    # the zero-shuffle tokenize plan applies unchanged to streaming input
    from samza_spark.pipeline import bpe
    from samza_spark.sources import FileSource

    d = tmp_path / "bpe_stream"
    d.mkdir()
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(1, "low lower"), (2, "slow glow")], schema
    ).write.parquet(str(d / "f1"))
    merges = [(1, "l", "o", "lo", 9), (2, "lo", "w", "low", 9)]
    src = FileSource(f"{d}/*", schema=schema).read_stream(spark).df
    out = bpe.bpe_tokenize(src, merges)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("bpe_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {r.doc_id: r for r in spark.sql("SELECT * FROM bpe_stream_out").collect()}
    assert rows[1].bpe_text == "low low e r"
    assert rows[2].bpe_text == "s low g low"


def test_learn_bpe_target_vocab_stops(spark, tmp_path):
    from samza_spark.pipeline import bpe

    df = spark.createDataFrame(
        [(1, "low lower lowest slow glow below")], "doc_id long, text string"
    )
    # alphabet: b,e,g,l,o,r,s,t,w = 9 distinct chars -> target 11 allows 2 merges
    merges = bpe.learn_bpe(df, n_merges=10, min_count=2, target_vocab=11)
    assert len(merges) == 2
    # persistence round-trip preserves order and values
    p = str(tmp_path / "merges")
    bpe.save_merges(spark, merges, p)
    assert bpe.load_merges(spark, p) == merges
    # target below the alphabet learns nothing
    assert bpe.learn_bpe(df, n_merges=10, target_vocab=5) == []


def test_dsir_importance_hand_model(spark):
    # target "a a b", raw "a b b": tc={a:2,b:1}, rc={a:1,b:2}, tt=rt=3, V=2
    # d(a) = floor(1e6*ln(3/5)) - floor(1e6*ln(2/5)) = -510826 - (-916291)
    #      = 405465; d(b) = -405465 by symmetry
    # raw doc "a b b" -> 405465 - 405465 - 405465 = -405465
    from samza_spark.pipeline.text import dsir_importance

    df = spark.createDataFrame(
        [(1, "a a b", "tgt"), (2, "a b b", "raw")],
        "doc_id long, text string, source string",
    )
    out = dsir_importance(df, F.col("source") == "tgt").collect()
    assert len(out) == 1
    r = out[0]
    assert r.doc_id == 2 and r.n_tokens == 3
    assert r.logweight_micro == -405465
    assert abs(r.avg_logweight - (-405465 / 1e6 / 3)) < 1e-12
    # hashed-feature path agrees when buckets don't collide
    hashed = dsir_importance(
        df, F.col("source") == "tgt", hash_buckets=1 << 30
    ).collect()
    assert [tuple(x) for x in hashed] == [tuple(x) for x in out]


def test_dsir_importance_prefers_target_like_docs(spark):
    from samza_spark.pipeline.text import dsir_importance

    rows = [(i, "physics quantum energy field theory", "tgt") for i in range(5)]
    rows += [(10, "physics energy quantum notes", "raw"),
             (11, "cooking recipes butter flour sugar", "raw")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: r for r in dsir_importance(df, F.col("source") == "tgt").collect()}
    assert out[10].avg_logweight > out[11].avg_logweight


def test_hard_negatives_label_filter(spark):
    from samza_spark.pipeline import similarity

    # query [1,0] with label 0: nearest overall is id 2 (same label —
    # must be excluded); hardest negatives are the different-label vecs
    # ordered by cosine
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.99, 0.14], 0),   # same label: never a negative
        (3, [0.9, 0.44], 1),    # hard negative (closest different-label)
        (4, [0.0, 1.0], 1),     # easy negative
        (5, [-1.0, 0.0], 2),    # opposite
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = similarity.hard_negatives(emb, emb.filter(F.col("vec_id") == 1), k=2).collect()
    got = [(r.query_id, r.neighbor_id, r.rank) for r in out]
    assert got == [(1, 3, 1), (1, 4, 2)]
    # with k above the negative count, same-label ids still never appear
    all_out = similarity.hard_negatives(emb, emb.filter(F.col("vec_id") == 1), k=10).collect()
    assert {r.neighbor_id for r in all_out} == {3, 4, 5}


def test_lsh_plan_s_curve_choice():
    from samza_spark.pipeline.dedup import lsh_plan

    bands, rows, cands = lsh_plan(0.8, num_perm=64, target_recall=0.95)
    assert bands * rows == 64
    chosen = next(c for c in cands if c[0] == bands)
    assert chosen[2] >= 0.95  # recall at threshold
    # the repo's default r=4/b=16 is feasible at 0.8 (recall ~0.9998);
    # the planner must pick a plan at least as selective at low sim
    b16 = next(c for c in cands if c[0] == 16)
    assert b16[2] > 0.99
    assert chosen[3] <= b16[3] + 1e-12
    # infeasible ask raises
    import pytest as _pytest

    with _pytest.raises(ValueError):
        lsh_plan(0.95, num_perm=2, target_recall=0.9999)
