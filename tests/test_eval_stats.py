"""Unit tests for the evaluation/test-statistic operators:
stats.ks_two_sample, stats.chi2_independence, similarity.retrieval_eval."""

import math

from pyspark.sql import functions as F

from samza_spark.pipeline import similarity
from samza_spark.pipeline import stats as pstats


# -- ks_two_sample ----------------------------------------------------------


def test_ks_identical_samples_is_zero(spark):
    rows = [(v, g) for v in [1, 2, 3, 4, 5] for g in [True, False]]
    df = spark.createDataFrame(rows, "v long, g boolean")
    out = pstats.ks_two_sample(df, "v", F.col("g")).collect()[0]
    assert out["d_num"] == 0 and out["d"] == 0.0
    assert out["n1"] == 5 and out["n2"] == 5


def test_ks_disjoint_samples_is_one(spark):
    rows = [(v, True) for v in [1, 2, 3]] + [(v, False) for v in [10, 11]]
    df = spark.createDataFrame(rows, "v long, g boolean")
    out = pstats.ks_two_sample(df, "v", F.col("g")).collect()[0]
    # sup gap at v=3: F1=1, F2=0 -> |3*2 - 0*3| = 6 = n1*n2
    assert out["d_num"] == out["n1"] * out["n2"] == 6
    assert out["d"] == 1.0
    assert out["ks_at_value"] == 3


def test_ks_matches_bruteforce_ecdf(spark):
    import random

    rng = random.Random(7)
    a = [rng.randrange(20) for _ in range(40)]
    b = [rng.randrange(25) for _ in range(60)]
    df = spark.createDataFrame(
        [(v, True) for v in a] + [(v, False) for v in b], "v long, g boolean"
    )
    out = pstats.ks_two_sample(df, "v", F.col("g")).collect()[0]
    vals = sorted(set(a) | set(b))
    exp = max(
        abs(sum(x <= v for x in a) * len(b) - sum(x <= v for x in b) * len(a))
        for v in vals
    )
    assert out["d_num"] == exp
    assert out["d"] == exp / (len(a) * len(b))


# -- chi2_independence ------------------------------------------------------


def test_chi2_perfect_association_has_cramers_v_one(spark):
    # 2x2, rows determine columns exactly: chi2 = n, V = 1
    rows = [("a", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, "r string, c string")
    out = pstats.chi2_independence(df, "r", "c").collect()[0]
    assert out["n"] == 20 and out["dof"] == 1
    # chi2 = n exactly (micro floor can shave < 4 micro over 4 cells)
    assert abs(out["chi2_micro"] - 20_000_000) <= 4
    assert abs(out["cramers_v"] - 1.0) < 1e-6


def test_chi2_independent_uniform_is_zero(spark):
    rows = [(r, c) for r in "ab" for c in "xy" for _ in range(5)]
    df = spark.createDataFrame(rows, "r string, c string")
    out = pstats.chi2_independence(df, "r", "c").collect()[0]
    assert out["chi2_micro"] == 0 and out["cramers_v"] == 0.0


def test_chi2_includes_unobserved_cells(spark):
    # 2x2 with one empty cell; compare against the textbook statistic
    rows = [("a", "x")] * 6 + [("a", "y")] * 2 + [("b", "x")] * 4
    df = spark.createDataFrame(rows, "r string, c string")
    out = pstats.chi2_independence(df, "r", "c").collect()[0]
    o = {("a", "x"): 6, ("a", "y"): 2, ("b", "x"): 4, ("b", "y"): 0}
    rt = {"a": 8, "b": 4}
    ct = {"x": 10, "y": 2}
    n = 12
    exp_micro = sum(
        ((o[(r, c)] * 10**6 - (rt[r] * ct[c] * 10**6) // n) ** 2)
        // ((rt[r] * ct[c] * 10**6) // n)
        for r in "ab"
        for c in "xy"
    )
    assert out["chi2_micro"] == exp_micro
    exact = sum(
        (o[(r, c)] - rt[r] * ct[c] / n) ** 2 / (rt[r] * ct[c] / n)
        for r in "ab"
        for c in "xy"
    )
    assert abs(out["chi2"] - exact) < 1e-4


# -- retrieval_eval ---------------------------------------------------------


def _vec(*xs):
    return [float(x) for x in xs]


def test_retrieval_eval_perfect_and_worst(spark):
    # label 0: 4 clones of e1 (queries find each other perfectly);
    # label 1: 4 clones of e2. Any query's top-3 are its 3 same-label
    # clones -> ndcg=1, rr=1e6, recall=1. Vectors are slightly jittered
    # in a LABEL-ALIGNED dimension so cosines stay label-separated.
    rows = []
    for i in range(4):
        rows.append((i, _vec(1.0, 0.01 * i, 0.0), 0))
        rows.append((10 + i, _vec(0.0, 0.0, 1.0 + 0.01 * i), 1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = similarity.retrieval_eval(emb, emb, k=3)
    got = {r["query_id"]: r for r in out.collect()}
    assert len(got) == 8
    for qid, r in got.items():
        assert r["n_rel_total"] == 3
        assert r["n_rel_topk"] == 3, (qid, r)
        assert r["first_rel_rank"] == 1
        assert r["rr_ppm"] == 1_000_000
        assert r["ndcg"] == 1.0
        assert r["recall_at_k"] == 1.0
        assert r["precision_at_k"] == 1.0


def test_retrieval_eval_miss_at_rank_one(spark):
    # query 0 (label 0): nearest is an off-label clone, second is the
    # single same-label vector -> first_rel_rank == 2.
    rows = [
        (0, _vec(1.0, 0.0), 0),  # query
        (1, _vec(1.0, 0.001), 1),  # impostor, nearly identical
        (2, _vec(0.9, 0.1), 0),  # true match, a bit further
        (3, _vec(0.0, 1.0), 1),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    qs = emb.filter(F.col("vec_id") == 0)
    r = similarity.retrieval_eval(emb, qs, k=2).collect()[0]
    assert r["first_rel_rank"] == 2
    assert r["rr_ppm"] == 500_000
    assert r["n_rel_topk"] == 1 and r["n_rel_total"] == 1
    disc, cum = similarity.ndcg_discounts_micro(2)
    assert r["dcg_micro"] == disc[1]
    assert r["idcg_micro"] == cum[0]
    assert r["ndcg"] == disc[1] / cum[0]
    assert r["recall_at_k"] == 1.0


def test_ndcg_discount_constants_are_floored_log2(spark):
    disc, cum = similarity.ndcg_discounts_micro(10)
    for i, d in enumerate(disc):
        assert d == int(10**9 // math.log2(i + 2))
    assert cum[-1] == sum(disc)
    assert disc[0] == 10**9
