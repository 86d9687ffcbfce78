"""Tests for corpus-level pipeline operators: boilerplate removal,
decontamination, chunking, and BM25 retrieval."""

import math

import pytest
from pyspark.sql import functions as F

from samza_spark.pipeline import boilerplate, decontam, retrieval
from samza_spark.pipeline.text import chunk_documents


@pytest.fixture(scope="module")
def corpus(spark):
    # 10 docs sharing the boilerplate phrase "all rights reserved", each
    # with a unique payload; one doc is pure boilerplate
    rows = [
        (i, f"payload {i} words here all rights reserved") for i in range(9)
    ]
    rows.append((9, "all rights reserved"))
    rows.append((10, "completely unique document with no shared phrases"))
    return spark.createDataFrame(rows, "doc_id long, text string")


# -- boilerplate ------------------------------------------------------------


def test_word_segments_cover_and_clamp(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x"), (3, "  ")], "doc_id long, text string"
    )
    segs = boilerplate.word_segments(df, seg_words=2)
    got = {
        (r.doc_id, r.seg_idx): r.segment
        for r in segs.collect()
    }
    # 5 tokens -> 3 segments, last one clamped to a single word
    assert got[(1, 0)] == "a b" and got[(1, 1)] == "c d" and got[(1, 2)] == "e"
    assert got[(2, 0)] == "x"
    assert got[(3, 0)] == ""  # whitespace-only doc yields one empty segment


def test_remove_frequent_segments_drops_boilerplate(spark, corpus):
    out = boilerplate.remove_frequent_segments(
        corpus, seg_words=3, min_df=5
    ).collect()
    by_id = {r.doc_id: r for r in out}
    # every input doc survives as a row
    assert set(by_id) == set(range(11))
    # the shared tail is gone from a payload doc, payload kept
    assert by_id[3].clean_text == "payload 3 words"
    assert by_id[3].n_removed == 2
    # doc 9's lone segment aligns differently from the payload docs'
    # windows (fixed-window segmentation is alignment-sensitive), so its
    # df is 1 and it survives untouched
    assert by_id[9].clean_text == "all rights reserved" and by_id[9].n_removed == 0
    # the unique doc is untouched
    assert by_id[10].n_removed == 0
    assert by_id[10].clean_text == "completely unique document with no shared phrases"


def test_line_segments(spark):
    df = spark.createDataFrame(
        [(1, "First Line\n\n  second line  \nthird")], "doc_id long, text string"
    )
    segs = {
        (r.seg_idx, r.segment) for r in boilerplate.line_segments(df).collect()
    }
    assert segs == {(0, "first line"), (2, "second line"), (3, "third")}


def test_segment_doc_freq_counts_distinct_docs(spark):
    # a segment repeated within one doc counts once
    df = spark.createDataFrame(
        [(1, "dup dup dup dup"), (2, "dup dup other words")],
        "doc_id long, text string",
    )
    freq = {
        r.segment: r.df
        for r in boilerplate.segment_doc_freq(
            boilerplate.word_segments(df, seg_words=2)
        ).collect()
    }
    assert freq["dup dup"] == 2


# -- decontamination --------------------------------------------------------


def test_contamination_flags_shared_ngrams(spark):
    bench = spark.createDataFrame(
        [(100, "the secret benchmark answer is forty two exactly")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "prefix words the secret benchmark answer is forty two exactly suffix"),
            (2, "totally unrelated training document with fresh content here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in decontam.contamination(train, bench, n=8).collect()}
    assert out[1].contaminated and out[1].n_overlap >= 1
    assert not out[2].contaminated and out[2].n_overlap == 0


def test_decontaminate_drops_only_contaminated(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (2, "clean document nothing shared with the benchmark at all"),
        ],
        "doc_id long, text string",
    )
    kept = decontam.decontaminate(train, bench, n=8)
    assert [r.doc_id for r in kept.collect()] == [2]


def test_short_doc_gram_clamp(spark):
    # docs shorter than n words emit their full text as the one gram
    bench = spark.createDataFrame([(1, "tiny doc")], "doc_id long, text string")
    train = spark.createDataFrame([(2, "tiny doc")], "doc_id long, text string")
    out = decontam.contamination(train, bench, n=8).collect()[0]
    assert out.contaminated and out.n_grams == 1


# -- chunking ---------------------------------------------------------------


def test_chunk_documents_window_arithmetic(spark):
    # 10 tokens, chunk 4, stride 3 -> chunks at offsets 0,3,6 and a tail at 9
    toks = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, toks)], "doc_id long, text string")
    chunks = chunk_documents(df, chunk_size=4, stride=3).orderBy("chunk_idx").collect()
    assert [c.chunk_text for c in chunks] == [
        "t0 t1 t2 t3",
        "t3 t4 t5 t6",
        "t6 t7 t8 t9",
    ]
    assert [c.n_tokens for c in chunks] == [4, 4, 4]
    # every token is covered
    covered = set()
    for c in chunks:
        covered.update(c.chunk_text.split())
    assert covered == set(toks.split())


def test_chunk_documents_short_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "only three tokens"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_id, r.chunk_idx): r
        for r in chunk_documents(df, chunk_size=8, stride=4).collect()
    }
    assert rows[(1, 0)].chunk_text == "only three tokens"
    assert rows[(2, 0)].chunk_text == "" and rows[(2, 0)].n_tokens == 0
    assert rows[(3, 0)].chunk_text == "" and rows[(3, 0)].n_tokens == 0
    assert len(rows) == 3


def test_chunk_documents_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=0, stride=4)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=4, stride=0)


# -- retrieval --------------------------------------------------------------


@pytest.fixture(scope="module")
def search_corpus(spark):
    rows = [
        (1, "spark spark spark engine"),
        (2, "spark engine overview document with many extra words padding length"),
        (3, "nothing relevant here at all"),
        (4, "engine engine engine"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_matches_reference_formula(spark, search_corpus):
    out = {r.doc_id: r for r in retrieval.bm25_scores(search_corpus, ["spark"]).collect()}
    # hand-computed: N=4, df=2 ("spark" occurs in docs 1 and 2)
    idf = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5))
    dls = {1: 4, 2: 10, 3: 5, 4: 3}
    avgdl = sum(dls.values()) / 4
    for doc, tf in [(1, 3), (2, 1), (3, 0), (4, 0)]:
        norm = 1.2 * (1 - 0.75 + 0.75 * dls[doc] / avgdl)
        expect = idf * tf * 2.2 / (tf + norm) if tf else 0.0
        assert out[doc].score == pytest.approx(expect, rel=1e-12)


def test_bm25_topk_order_and_rank(spark, search_corpus):
    top = retrieval.bm25_topk(search_corpus, ["spark", "engine"], k=3).collect()
    assert [r.rank for r in top] == [1, 2, 3]
    assert top[0].score >= top[1].score >= top[2].score
    # doc 1 (3x spark in a short doc) outranks everything
    assert top[0].doc_id == 1


def test_posting_lists_sorted(spark, search_corpus):
    out = {r.term: r for r in retrieval.posting_lists(
        search_corpus, ["spark", "engine"]).collect()}
    assert out["spark"].postings == [1, 2] and out["spark"].df == 2
    assert out["engine"].postings == [1, 2, 4]


def test_bm25_plan_is_broadcast_and_takeordered(spark, search_corpus):
    plan = retrieval.bm25_topk(
        search_corpus, ["spark"], k=5
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan
