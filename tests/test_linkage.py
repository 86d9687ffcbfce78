"""Exact set-similarity join (AllPairs/PPJoin prefix filter) and the
round-5 span/keep-first/TF-IDF corpus operators."""

import pytest
from pyspark.sql import functions as F

from samza_spark.catalog import load_table
from samza_spark.pipeline import boilerplate, decontam, linkage, retrieval


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


# ---------------------------------------------------------------------------
# similarity_join
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("threshold", [0.4, 0.6, 0.8])
def test_prefix_filter_is_lossless(spark, sf_dir, threshold):
    """The load-bearing property: prefix-filtered candidates + exact verify
    must equal the brute-force all-pairs join at EVERY threshold."""
    docs = load_table(spark, sf_dir, "documents")
    fast = _rows(
        linkage.similarity_join(docs, n=3, threshold=threshold),
        "id_a",
        "id_b",
    )
    brute = _rows(
        linkage.similarity_join_bruteforce(docs, n=3, threshold=threshold),
        "id_a",
        "id_b",
    )
    assert fast == brute
    assert all(j >= threshold for (_, _, _, j) in fast)
    assert all(a < b for (a, b, _, _) in fast)


def test_similarity_join_plan_has_no_cartesian(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        linkage.similarity_join(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_similarity_join_identical_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    out = _rows(linkage.similarity_join(df, threshold=0.9), "id_a", "id_b")
    assert len(out) == 1
    a, b, n_common, j = out[0]
    assert (a, b) == (1, 2) and j == 1.0


# ---------------------------------------------------------------------------
# contaminated_span_stats
# ---------------------------------------------------------------------------


def test_span_decontam_removes_only_benchmark_spans(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            # contains the benchmark 4-gram verbatim in the middle
            (1, "x1 x2 alpha beta gamma delta y1 y2"),
            (2, "no overlap with anything at all"),
            (3, "alpha beta gamma delta"),  # fully contaminated
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in decontam.contaminated_span_stats(
            train, bench, n=4
        ).collect()
    }
    assert out[1]["contam_tokens"] == 4
    assert out[1]["clean_text"] == "x1 x2 y1 y2"
    assert out[2]["n_contam_grams"] == 0 and out[2]["contam_frac"] == 0.0
    assert out[3]["contam_frac"] == 1.0 and out[3]["clean_text"] == ""


def test_span_decontam_short_docs_emit_no_grams(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    r = decontam.contaminated_span_stats(train, bench, n=4).collect()[0]
    # shorter than n: no window can match, doc survives untouched
    assert r["contam_tokens"] == 0
    assert r["clean_text"] == "alpha beta gamma"


# ---------------------------------------------------------------------------
# dedup_segments_keep_first
# ---------------------------------------------------------------------------


def test_keep_first_keeps_exactly_one_copy(spark):
    df = spark.createDataFrame(
        [
            (1, "aa bb cc dd"),
            (2, "aa bb ee ff"),
            (3, "cc dd aa bb"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate.dedup_segments_keep_first(
            df, seg_words=2
        ).collect()
    }
    # 'aa bb' first occurs at (1, 0); 'cc dd' at (1, 1)
    assert out[1]["clean_text"] == "aa bb cc dd" and out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "ee ff" and out[2]["n_removed"] == 1
    assert out[3]["clean_text"] == "" and out[3]["n_removed"] == 2


def test_keep_first_corpus_wide_segment_uniqueness(spark, sf_dir):
    """After keep-first dedup every segment occurs at most once across the
    whole corpus's clean_texts."""
    docs = load_table(spark, sf_dir, "documents")
    cleaned = boilerplate.dedup_segments_keep_first(docs, seg_words=2)
    segs = boilerplate.word_segments(
        cleaned.where(F.col("clean_text") != ""), "clean_text", "doc_id", 2
    )
    dup = (
        segs.groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert dup == 0


# ---------------------------------------------------------------------------
# tfidf_keywords
# ---------------------------------------------------------------------------


def test_tfidf_ranks_rare_terms_above_stopwords(spark):
    df = spark.createDataFrame(
        [
            (1, "common common common zebra zebra unique"),
            (2, "common common filler filler filler words"),
            (3, "common words words again and again too"),
        ],
        "doc_id long, text string",
    )
    out = retrieval.tfidf_keywords(df, k=2, min_token_len=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 'common' appears in all 3 docs -> idf = ln(1) = 0 -> never a keyword
    # while any df<3 term has positive score
    for doc_id, rows in by_doc.items():
        assert all(r["rank"] <= 2 for r in rows)
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == (
            list(range(1, len(rows) + 1))
        )
        assert all(
            r["term"] != "common" for r in rows
        ), f"zero-idf term ranked in doc {doc_id}"
    assert by_doc[1][0]["term"] == "zebra"  # tf=2, df=1: top keyword


def test_tfidf_min_token_len_floor(spark):
    df = spark.createDataFrame(
        [(1, "ab cd efgh efgh"), (2, "zz xx wxyz")],
        "doc_id long, text string",
    )
    out = retrieval.tfidf_keywords(df, k=5, min_token_len=3).collect()
    assert {r["term"] for r in out} <= {"efgh", "wxyz"}


# ---------------------------------------------------------------------------
# containment_join
# ---------------------------------------------------------------------------


def _containment_bruteforce(spark, df, n=3, threshold=0.8):
    from samza_spark.pipeline.linkage import _shingle_sets

    sets_df = _shingle_sets(df, "text", "doc_id", n)
    a = sets_df.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sha"))
    b = sets_df.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__shb"))
    inter = F.size(F.array_intersect("__sha", "__shb"))
    ca = inter.cast("double") / F.size("__sha").cast("double")
    cb = inter.cast("double") / F.size("__shb").cast("double")
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            inter.cast("int").alias("n_common"),
            ca.alias("cont_a_in_b"),
            cb.alias("cont_b_in_a"),
        )
        .where(
            (F.col("cont_a_in_b") >= threshold)
            | (F.col("cont_b_in_a") >= threshold)
        )
    )


@pytest.mark.parametrize("threshold", [0.6, 0.8, 0.95])
def test_containment_prefix_filter_is_lossless(spark, sf_dir, threshold):
    docs = load_table(spark, sf_dir, "documents")
    fast = _rows(
        linkage.containment_join(docs, threshold=threshold), "id_a", "id_b"
    )
    brute = _rows(
        _containment_bruteforce(spark, docs, threshold=threshold), "id_a", "id_b"
    )
    assert fast == brute
    assert all(max(ca, cb) >= threshold for (_, _, _, ca, cb) in fast)


def test_containment_catches_subset_jaccard_misses(spark):
    # doc 2 is doc 1's text verbatim inside a much longer page: containment
    # of 2 in 1 is 1.0 while jaccard is far below any dedup threshold
    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"filler{i} pad{i} word{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, long), (2, short), (3, "unrelated content of another page wholly")],
        "doc_id long, text string",
    )
    out = _rows(linkage.containment_join(df, threshold=0.95), "id_a", "id_b")
    assert [(a, b) for (a, b, *_rest) in out] == [(1, 2)]
    _, _, _, ca, cb = out[0]
    assert cb == 1.0  # the short doc is fully contained
    sym = _rows(linkage.similarity_join(df, threshold=0.6), "id_a", "id_b")
    assert sym == []  # jaccard-based join misses it
