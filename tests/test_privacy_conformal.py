"""Hand-checked semantics for l-diversity, t-closeness, and the
split-conformal threshold (beyond the oracle gate's replay)."""

from samza_spark.pipeline.governance import l_diversity, t_closeness
from samza_spark.pipeline.stats import conformal_threshold


def test_l_diversity_flags_homogeneous_class(spark):
    df = spark.createDataFrame(
        [("g1", "flu"), ("g1", "flu"), ("g1", "flu"),
         ("g2", "flu"), ("g2", "cold"), ("g2", "covid")],
        "qi string, dx string",
    )
    got = {r["qi"]: r for r in l_diversity(df, ["qi"], "dx", l=2).collect()}
    assert got["g1"]["n_sensitive"] == 1 and got["g1"]["violates"]
    assert got["g2"]["n_sensitive"] == 3 and not got["g2"]["violates"]


def test_t_closeness_zero_for_matching_distribution(spark):
    # both classes mirror the global 50/50 split exactly -> tvd 0
    df = spark.createDataFrame(
        [("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b")],
        "qi string, v string",
    )
    for r in t_closeness(df, ["qi"], "v", t_ppm=1).collect():
        assert r["tvd_ppm"] == 0 and not r["violates"]


def test_t_closeness_skewed_class(spark):
    """Exact arithmetic on paper: global {a:3, b:1} over 4 rows; class
    g1 = {a, a} -> p_class = {a:1}, p_global = {a:.75, b:.25};
    TVD = (|1-.75| + |0-.25|)/2 = .25 -> 250000 ppm."""
    df = spark.createDataFrame(
        [("g1", "a"), ("g1", "a"), ("g2", "a"), ("g2", "b")],
        "qi string, v string",
    )
    got = {r["qi"]: r for r in t_closeness(df, ["qi"], "v", t_ppm=200_000).collect()}
    assert got["g1"]["tvd_ppm"] == 250_000 and got["g1"]["violates"]
    assert got["g2"]["tvd_ppm"] == 250_000  # mirror-skewed the other way


def test_conformal_threshold_rank_math(spark):
    # scores 1..10; alpha = 0.5 -> k = ceil(11 * 0.5) = 6 -> qhat = 6
    df = spark.range(1, 11).selectExpr("id as s")
    [r] = conformal_threshold(df, "s", alpha_ppm=500_000).collect()
    assert (r["n"], r["k_rank"], r["qhat"]) == (10, 6, 6)
    # alpha = 0.0 -> k = 11 clamped to n -> qhat = max score
    [r0] = conformal_threshold(df, "s", alpha_ppm=0).collect()
    assert (r0["k_rank"], r0["qhat"]) == (10, 10)


def test_conformal_threshold_grouped_with_ties(spark):
    df = spark.createDataFrame(
        [("a", 5)] * 8 + [("a", 9)] * 2 + [("b", 1)] * 10,
        "g string, s int",
    )
    got = {r["g"]: r for r in conformal_threshold(df, "s", 100_000, ["g"]).collect()}
    # group a: n=10, k=ceil(11*.9)=10 -> 10th smallest = 9
    assert (got["a"]["k_rank"], got["a"]["qhat"]) == (10, 9)
    # group b: all ties at 1 -> qhat = 1
    assert got["b"]["qhat"] == 1


def test_bh_fdr_textbook_case(spark):
    """Classic BH: p = (.005,.01,.03,.04,.2), alpha=.05 -> lines
    (.01,.02,.03,.04,.05): ranks 1-4 pass, rank 5 fails -> 4 rejections."""
    from samza_spark.pipeline.stats import bh_fdr

    df = spark.createDataFrame(
        [("a", 5000), ("b", 10000), ("c", 30000), ("d", 40000), ("e", 200000)],
        "unit string, p_ppm int",
    )
    got = {r["unit"]: r for r in bh_fdr(df, "p_ppm", alpha_ppm=50_000).collect()}
    assert [got[u]["significant"] for u in "abcde"] == [True] * 4 + [False]


def test_bh_fdr_step_up_rescues_middle_rank(spark):
    """Step-up: rank 2 fails its own line but rank 3 passes -> ALL THREE
    significant (the property a naive per-rank threshold gets wrong).
    p=(.001,.041,.058), alpha=.06 -> lines (.02,.04,.06)."""
    from samza_spark.pipeline.stats import bh_fdr

    df = spark.createDataFrame(
        [("a", 1000), ("b", 41000), ("c", 58000)], "unit string, p_ppm int"
    )
    rows = bh_fdr(df, "p_ppm", alpha_ppm=60_000).collect()
    assert all(r["significant"] for r in rows)
    assert [r["bh_line_pass"] for r in sorted(rows, key=lambda r: r["rank"])] == [
        True, False, True,
    ]


def test_mutual_information_analytic_cases(spark):
    from math import log

    from samza_spark.pipeline.stats import mutual_information

    # independence: x and y uniform and unrelated -> MI == 0 exactly
    # (every cell term is ln(1) = 0); H(x) == ln(2)
    ind = spark.createDataFrame(
        [(x, y) for x in "ab" for y in "cd" for _ in range(5)],
        "x string, y string",
    )
    [r] = mutual_information(ind, "x", "y").collect()
    assert r["mi_nats"] == 0.0
    assert abs(r["h_x_nats"] - log(2)) < 1e-12

    # pure dependence: y = f(x) -> MI == H(x) == H(y)
    dep = spark.createDataFrame(
        [("a", "A")] * 3 + [("b", "B")] * 3 + [("c", "C")] * 6,
        "x string, y string",
    )
    [r] = mutual_information(dep, "x", "y").collect()
    assert abs(r["mi_nats"] - r["h_x_nats"]) < 1e-12
    assert abs(r["h_x_nats"] - r["h_y_nats"]) < 1e-12
    want = -(0.25 * log(0.25) + 0.25 * log(0.25) + 0.5 * log(0.5))
    assert abs(r["h_x_nats"] - want) < 1e-12


def test_rolling_origin_folds_monotone_train(spark):
    from pyspark.sql import functions as F

    from samza_spark.pipeline.stats import rolling_origin_folds

    df = spark.range(1000).select(
        F.timestamp_micros(F.col("id") * 3_600_000_000).alias("ts")
    )
    rows = sorted(
        rolling_origin_folds(df, "ts", n_folds=4, horizon_us=10 * 3_600_000_000).collect(),
        key=lambda r: r["fold"],
    )
    # later origins strictly grow the training window; every fold has a
    # full 10-hour test window (10 hourly events)
    trains = [r["n_train"] for r in rows]
    assert trains == sorted(trains) and trains[0] > 0
    assert all(r["n_test"] == 10 for r in rows)
    assert all(r["n_train"] + r["n_test"] <= 1000 for r in rows)
