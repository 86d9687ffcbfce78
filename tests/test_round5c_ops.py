"""Round-5 (cont.) additions: OHLC bars, interval audit, seasonal
anomalies, PMI collocations, quantile normalization, k-anonymity —
semantics pinned on small hand-checkable inputs (the DuckDB oracle
covers the sf0.01 corpus shapes)."""

import datetime as dt

from pyspark.sql import functions as F

from samza_spark.pipeline import events as pevents
from samza_spark.pipeline import governance, text


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


# ---------------------------------------------------------------------------
# ohlc_bars
# ---------------------------------------------------------------------------


def test_ohlc_bars_basic(spark):
    rows = [
        (1, _ts(0), "a", 10.0),
        (2, _ts(5), "a", 30.0),
        (3, _ts(9), "a", 20.0),
        (4, _ts(1), "b", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    bars = {
        r["event_type"]: r
        for r in pevents.ohlc_bars(df, bucket="hour").collect()
    }
    a = bars["a"]
    assert (a["open"], a["high"], a["low"], a["close"], a["n"]) == (
        10.0,
        30.0,
        10.0,
        20.0,
        3,
    )
    b = bars["b"]
    assert (b["open"], b["close"], b["n"]) == (5.0, 5.0, 1)


def test_ohlc_bars_tiebreak_on_id(spark):
    # identical timestamps: open/close decided by event_id, not luck
    rows = [
        (2, _ts(0), "a", 7.0),
        (1, _ts(0), "a", 3.0),
        (3, _ts(0), "a", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    bar = pevents.ohlc_bars(df, bucket="hour").collect()[0]
    assert bar["open"] == 3.0 and bar["close"] == 5.0


# ---------------------------------------------------------------------------
# interval_audit
# ---------------------------------------------------------------------------


def test_interval_audit_flags_gap_and_overlap(spark):
    rows = [
        # key 1: [0,10) [10,20) clean; [20,35) then [30,..) overlaps 5s
        (1, _ts(0, 0), _ts(0, 10), 1),
        (1, _ts(0, 10), _ts(0, 20), 2),
        (1, _ts(0, 20), _ts(0, 35), 3),
        (1, _ts(0, 30), _ts(0, 40), 4),
        # key 2: gap of 60s
        (2, _ts(0, 0), _ts(0, 30), 5),
        (2, _ts(1, 30), _ts(2, 0), 6),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, valid_from timestamp, valid_to timestamp, event_id long"
    )
    out = pevents.interval_audit(df, tiebreak_col="event_id").collect()
    by_kind = {(r["user_id"], r["kind"]): r["discrepancy_us"] for r in out}
    assert by_kind == {(1, "overlap"): 5_000_000, (2, "gap"): 60_000_000}


def test_interval_audit_open_interval_overlaps(spark):
    # two "current" rows for one key: the double-current SCD2 bug
    rows = [(1, _ts(0, 0), None, 1), (1, _ts(0, 30), None, 2)]
    df = spark.createDataFrame(
        rows, "user_id long, valid_from timestamp, valid_to timestamp, event_id long"
    )
    out = pevents.interval_audit(df, tiebreak_col="event_id").collect()
    assert len(out) == 1 and out[0]["kind"] == "overlap"


def test_interval_audit_clean_scd2_is_empty(spark):
    changes = spark.createDataFrame(
        [(1, _ts(0), 10), (1, _ts(5), 11), (2, _ts(1), 20)],
        "user_id long, ts timestamp, v long",
    )
    dim = pevents.scd2_intervals(changes, attr_cols=["v"])
    closed = dim.filter(F.col("valid_to").isNotNull())
    assert pevents.interval_audit(closed).count() == 0


# ---------------------------------------------------------------------------
# seasonal_anomaly
# ---------------------------------------------------------------------------


def test_seasonal_anomaly_flags_only_outlier(spark):
    # hour-0 baseline is tight around 10; one wild point sticks out
    rows = [(i, _ts(i), "x", 10.0 + (i % 3) * 0.01) for i in range(1, 20)]
    rows.append((99, _ts(20), "x", 500.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = pevents.seasonal_anomaly(df, k_mad=3).collect()
    assert [r["event_id"] for r in out] == [99]
    assert abs(out[0]["value"] - 500.0) < 1e-9


def test_seasonal_anomaly_constant_cell_no_flags(spark):
    # zero MAD + zero deviation: nothing flagged
    rows = [(i, _ts(i), "x", 7.0) for i in range(1, 10)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    assert pevents.seasonal_anomaly(df, k_mad=3).count() == 0


# ---------------------------------------------------------------------------
# pmi_collocations
# ---------------------------------------------------------------------------


def test_pmi_collocations_exclusive_pair_beats_promiscuous(spark):
    # (a b) always adjacent; c and d both frequent but mostly with OTHER
    # partners — PMI must rank the exclusive pair above the incidental one
    docs = [
        ("a b " * 5).strip(),
        "c x c y c z d p d q d r c d c d c d",
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    out = text.pmi_collocations(df, min_count=3, top_k=10).collect()
    ppm = {(r["prev"], r["cur"]): r["pmi_ppm"] for r in out}
    assert ppm[("a", "b")] > ppm[("c", "d")]
    scores = [r["pmi_ppm"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # hand-check: c_ab=5, prev-marginal(a)=5, cur-marginal(b)=5, N=26
    assert ppm[("a", "b")] == (5 * 26 * 1_000_000) // (5 * 5)


def test_pmi_collocations_min_count_filters(spark):
    df = spark.createDataFrame(
        [(1, "rare pair here"), (2, "common common common common")],
        "doc_id long, text string",
    )
    out = text.pmi_collocations(df, min_count=3, top_k=10).collect()
    assert all(r["c_ab"] >= 3 for r in out)


# ---------------------------------------------------------------------------
# quantile_normalize
# ---------------------------------------------------------------------------


def test_quantile_normalize_maps_extremes_and_median(spark):
    # source a: 1..5 (global min..max interleaved), source b: 10..50
    rows = [(i, "a", v) for i, v in enumerate([1, 2, 3, 4, 5])] + [
        (10 + i, "b", v) for i, v in enumerate([10, 20, 30, 40, 50])
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = {r["doc_id"]: r for r in governance.quantile_normalize(df).collect()}
    glob = sorted([1, 2, 3, 4, 5, 10, 20, 30, 40, 50])
    # min of each source -> global min; max -> global max
    assert out[0]["normalized"] == glob[0]
    assert out[4]["normalized"] == glob[-1]
    assert out[10]["normalized"] == glob[0]
    assert out[14]["normalized"] == glob[-1]
    # within-source rank 3 of 5 -> global index 1 + (2*9)//4 = 5 -> glob[4]
    assert out[2]["normalized"] == glob[4]
    assert out[12]["normalized"] == glob[4]
    # every source now has the identical (sub)distribution support
    a_vals = sorted(r["normalized"] for r in out.values() if r["source"] == "a")
    b_vals = sorted(r["normalized"] for r in out.values() if r["source"] == "b")
    assert a_vals == b_vals


def test_quantile_normalize_singleton_group_maps_to_median(spark):
    rows = [(1, "solo", 999), (2, "big", 1), (3, "big", 2), (4, "big", 3)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = {r["doc_id"]: r for r in governance.quantile_normalize(df).collect()}
    # N=4 -> median index 1 + (4-1)//2 = 2 -> second smallest global value
    assert out[1]["normalized"] == sorted([999, 1, 2, 3])[1]


# ---------------------------------------------------------------------------
# k_anonymity
# ---------------------------------------------------------------------------


def test_k_anonymity_flags_small_classes(spark):
    rows = [("a", 1)] * 5 + [("a", 2)] * 2 + [("b", 1)] * 1
    df = spark.createDataFrame(rows, "qa string, qb long")
    out = {
        (r["qa"], r["qb"]): (r["class_size"], r["suppressed"])
        for r in governance.k_anonymity(df, ["qa", "qb"], k=3).collect()
    }
    assert out == {("a", 1): (5, False), ("a", 2): (2, True), ("b", 1): (1, True)}


def test_k_anonymity_report_bp(spark):
    rows = [("a",)] * 8 + [("b",)] * 2
    df = spark.createDataFrame(rows, "qa string")
    r = governance.k_anonymity_report(df, ["qa"], k=5).collect()[0]
    assert (r["n_classes"], r["suppressed_classes"]) == (2, 1)
    assert (r["n_rows"], r["suppressed_rows"]) == (10, 2)
    assert r["suppression_bp"] == 2000


# ---------------------------------------------------------------------------
# greedy_max_coverage
# ---------------------------------------------------------------------------


def test_greedy_coverage_prefers_broad_then_complement(spark):
    from samza_spark.pipeline import sampling

    # doc 1 covers grams of "a b c d e" (3 grams); doc 2 overlaps it almost
    # fully; doc 3 is disjoint with 2 grams. Greedy must pick 1 then 3.
    docs = [
        (1, "a b c d e"),
        (2, "a b c d"),
        (3, "x y z w"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = sampling.greedy_max_coverage(df, k=2).collect()
    assert [(r["round"], r["doc_id"], r["gain"]) for r in out] == [
        (1, 1, 3),
        (2, 3, 2),
    ]
    assert out[-1]["covered_total"] == 5


def test_greedy_coverage_gains_non_increasing(spark):
    from samza_spark.pipeline import sampling

    docs = [(i, f"tok{i} " * 3 + "shared common words here") for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = sampling.greedy_max_coverage(df, k=4).collect()
    gains = [r["gain"] for r in sorted(out, key=lambda r: r["round"])]
    assert gains == sorted(gains, reverse=True)


def test_greedy_coverage_stops_when_exhausted(spark):
    from samza_spark.pipeline import sampling

    df = spark.createDataFrame([(1, "only doc here")], "doc_id long, text string")
    out = sampling.greedy_max_coverage(df, k=5).collect()
    assert len(out) == 1


# ---------------------------------------------------------------------------
# sequence_patterns
# ---------------------------------------------------------------------------


def test_sequence_patterns_counts_and_support(spark):
    from samza_spark.pipeline import events as pevents

    # user 1: v c p v c p -> trigrams (v,c,p) x2, (c,p,v), (p,v,c)
    rows = []
    seq = ["view", "click", "buy", "view", "click", "buy"]
    for i, t in enumerate(seq):
        rows.append((i, _ts(i), 1, t))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = pevents.sequence_patterns(df, top_k=10).collect()
    top = out[0]
    assert (top["e1"], top["e2"], top["e3"], top["n"]) == (
        "view",
        "click",
        "buy",
        2,
    )
    assert top["support_ppm"] == 2 * 1_000_000 // 4
    # trigrams never cross user boundaries
    rows.append((100, _ts(30), 2, "buy"))
    df2 = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    assert (
        pevents.sequence_patterns(df2, top_k=10)
        .agg(F.sum("n"))
        .collect()[0][0]
        == 4
    )


# ---------------------------------------------------------------------------
# changepoint_cusum
# ---------------------------------------------------------------------------


def test_changepoint_cusum_finds_level_shift(spark):
    import datetime as dt

    from samza_spark.pipeline import stats as pstats

    rows = []
    eid = 0
    # 6 days at 2/day then 6 days at 10/day: the shift is after day 5
    for day in range(12):
        n = 2 if day < 6 else 10
        for j in range(n):
            eid += 1
            rows.append((eid, dt.datetime(2024, 3, 1 + day, 8, j), "x"))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = pstats.changepoint_cusum(df).collect()
    assert len(out) == 1
    r = out[0]
    # peak |CUSUM| lands on the last low day (2024-03-06)
    assert r["bucket_s"] == int(dt.datetime(2024, 3, 6, tzinfo=dt.timezone.utc).timestamp())
    assert r["n_buckets"] == 12 and r["total"] == 72
    # S at day 6 = 6 * (2*12 - 72) = -288
    assert r["cusum_scaled"] == -288


# ---------------------------------------------------------------------------
# periodicity
# ---------------------------------------------------------------------------


def test_periodicity_regular_vs_bursty(spark):
    from samza_spark.pipeline import events as pevents

    rows = []
    # user 1: perfect 60s cadence -> MAD 0 -> regularity 0
    for i in range(6):
        rows.append((i, _ts(i), 1))
    # user 2: gaps 10, 100, 10, 400, 20 seconds -> wildly irregular
    bursty = [0, 10, 110, 120, 520, 540]
    for j, s in enumerate(bursty):
        rows.append((100 + j, _ts(s // 60, s % 60), 2))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = {r["user_id"]: r for r in pevents.periodicity(df, min_gaps=4).collect()}
    assert out[1]["regularity_ppm"] == 0
    assert out[1]["med_x2"] == 2 * 60_000_000
    assert out[2]["regularity_ppm"] > 300_000  # MAD comparable to median
    # below-min-gaps keys are excluded
    few = spark.createDataFrame(
        [(1, _ts(0), 9), (2, _ts(1), 9), (3, _ts(2), 9)],
        "event_id long, ts timestamp, user_id long",
    )
    assert pevents.periodicity(few, min_gaps=4).count() == 0


# ---------------------------------------------------------------------------
# leadlag_xcorr
# ---------------------------------------------------------------------------


def test_leadlag_xcorr_detects_shifted_copy(spark):
    import datetime as dt

    from samza_spark.pipeline import stats as pstats

    rows, eid = [], 0
    # clicks on day d: pattern [1,5,2,8,3]; purchases = same pattern one
    # day later -> lag +1 aligns perfectly (cov_num == varx_num == vary_num)
    pattern = [1, 5, 2, 8, 3]
    for day, n in enumerate(pattern):
        for _ in range(n):
            eid += 1
            rows.append((eid, dt.datetime(2024, 5, 1 + day, 9), "click"))
        for _ in range(n):
            eid += 1
            rows.append((eid, dt.datetime(2024, 5, 2 + day, 9), "purchase"))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {
        r["lag"]: r
        for r in pstats.leadlag_xcorr(df, "click", "purchase", lags=(0, 1)).collect()
    }
    r1 = out[1]
    assert r1["n_days"] == 5
    assert r1["cov_num"] == r1["varx_num"] == r1["vary_num"] > 0
    # at lag 0 the alignment is broken: correlation strictly weaker
    r0 = out[0]
    assert r0["cov_num"] ** 2 * r1["varx_num"] * r1["vary_num"] < (
        r1["cov_num"] ** 2 * r0["varx_num"] * r0["vary_num"]
    )


# ---------------------------------------------------------------------------
# rolling_active_users
# ---------------------------------------------------------------------------


def test_rolling_active_users_exact_window(spark):
    import datetime as dt

    from samza_spark.pipeline import events as pevents

    day = lambda d: dt.datetime(2024, 6, d, 12)  # noqa: E731
    rows = [
        # user 1 active day 1 and day 2 (counts ONCE per window)
        (1, day(1), 1),
        (2, day(2), 1),
        # user 2 active day 1 only; user 3 active day 5
        (3, day(1), 2),
        (4, day(5), 3),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = {
        r["window_end_s"]: r["active_users"]
        for r in pevents.rolling_active_users(df, window_days=3).collect()
    }
    epoch = lambda d: int(  # noqa: E731
        dt.datetime(2024, 6, d, tzinfo=dt.timezone.utc).timestamp()
    )
    # window ending day1: users {1,2}; day2: {1,2}; day3: {1,2};
    # day4: {1} (user2's day-1 activity aged out at day4? window=(d-2..d):
    # day4 covers days 2..4 -> user1 only); day5: {1? no (day2<3)} -> {3}
    assert out[epoch(1)] == 2
    assert out[epoch(2)] == 2
    assert out[epoch(3)] == 2
    assert out[epoch(4)] == 1
    assert out[epoch(5)] == 1
    # no windows past the observed span
    assert max(out) == epoch(5)


# ---------------------------------------------------------------------------
# join_fanout_audit / benford_audit / weighted_median / last_touch
# ---------------------------------------------------------------------------


def test_join_fanout_audit_products(spark):
    from samza_spark.pipeline import quality

    left = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k long")
    right = spark.createDataFrame([(1,), (1,), (1,), (4,)], "k long")
    out = {r["k"]: r for r in quality.join_fanout_audit(left, right, "k").collect()}
    assert (out[1]["n_left"], out[1]["n_right"], out[1]["out_rows"]) == (2, 3, 6)
    assert out[2]["out_rows"] == 0 and out[4]["n_left"] == 0


def test_benford_first_digit_extraction(spark):
    from samza_spark.pipeline import quality

    # values whose µ-scaled first digits are known; 0/negatives excluded
    vals = [1.0, 19.5, 0.000002, 300.0, 9.99, -5.0, 0.0]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    out = {r["digit"]: r["n"] for r in quality.benford_audit(df, "value").collect()}
    assert out == {1: 2, 2: 1, 3: 1, 9: 1}


def test_weighted_median_crossing_rule(spark):
    from samza_spark.pipeline import stats as pstats

    # values 1..4 with weights 1,1,1,7 -> weighted median is 4;
    # unweighted median would be 2
    rows = [("g", 1, 1, 1), ("g", 2, 2, 1), ("g", 3, 3, 1), ("g", 4, 4, 7)]
    df = spark.createDataFrame(rows, "g string, i long, v long, wt long")
    r = pstats.weighted_median(df, "g", "v", "wt", "i").collect()[0]
    assert (r["wmedian"], r["totw"], r["n"]) == (4, 10, 4)
    # equal weights degrade to the plain lower median
    rows2 = [("h", i, v, 1) for i, v in enumerate([10, 20, 30, 40])]
    df2 = spark.createDataFrame(rows2, "g string, i long, v long, wt long")
    assert pstats.weighted_median(df2, "g", "v", "wt", "i").collect()[0][
        "wmedian"
    ] == 20


def test_last_touch_attribution_window_and_lookback(spark):
    from samza_spark.pipeline import events as pevents

    rows = [
        (1, _ts(0), 1, "click"),
        (2, _ts(5), 1, "click"),      # latest prior click
        (3, _ts(10), 1, "purchase"),  # attributed to 2
        (4, _ts(11), 1, "purchase"),  # still 2 (clicks only before)
        (5, _ts(0), 2, "view"),
        (6, _ts(3), 2, "purchase"),   # no click -> unattributed
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        r["conversion_id"]: r
        for r in pevents.last_touch_attribution(df).collect()
    }
    assert out[3]["touch_id"] == 2 and out[3]["delay_us"] == 5 * 60_000_000
    assert out[4]["touch_id"] == 2
    assert out[6]["touch_id"] is None and out[6]["delay_us"] is None
    # lookback: a click 10 minutes before with lookback of 1 minute -> null
    short = pevents.last_touch_attribution(df, lookback="1 minute").collect()
    short = {r["conversion_id"]: r for r in short}
    assert short[3]["touch_id"] is None


# ---------------------------------------------------------------------------
# fd_audit / conversion_delay_ecdf / ab_test_report / pii_report
# ---------------------------------------------------------------------------


def test_fd_audit_clean_and_violating(spark):
    from samza_spark.pipeline import quality

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "b"), (2, "c"), (3, "a")],
        "k long, v string",
    )
    r = quality.fd_audit(df, ["k"], "v").collect()[0]
    assert (r["n_keys"], r["n_violating"], r["max_variants"]) == (3, 1, 3)
    assert r["violation_ppm"] == 1_000_000 // 3
    clean = quality.fd_audit(df.select("k", F.lit("x").alias("v")), ["k"], "v")
    assert clean.collect()[0]["n_violating"] == 0


def test_conversion_delay_ecdf_buckets(spark):
    import datetime as dt

    from samza_spark.pipeline import events as pevents

    d = lambda day, h=0: dt.datetime(2024, 7, day, h)  # noqa: E731
    rows = [
        # user 1: signup day1, purchase day1 (delay 0)
        (1, d(1), 1, "signup"), (2, d(1, 5), 1, "purchase"),
        # user 2: signup day1, purchase day3 (delay 2)
        (3, d(1), 2, "signup"), (4, d(3), 2, "purchase"),
        # user 3: purchase BEFORE signup -> excluded
        (5, d(2), 3, "purchase"), (6, d(3), 3, "signup"),
        # user 4: signup only -> not a converter
        (7, d(1), 4, "signup"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r["delay_days"]: r for r in pevents.conversion_delay_ecdf(df).collect()}
    assert out[0]["n_users"] == 1 and out[0]["cum_ppm"] == 500_000
    assert out[2]["cum_users"] == 2 and out[2]["cum_ppm"] == 1_000_000
    assert set(out) == {0, 2}


def test_ab_test_report_exact_counts(spark):
    import datetime as dt

    from samza_spark.pipeline import events as pevents
    from samza_spark.pipeline.sampling import _hash_bucket

    rows = []
    for u in range(40):
        rows.append((u * 2, dt.datetime(2024, 1, 1), u, "view"))
        if u % 4 == 0:
            rows.append((u * 2 + 1, dt.datetime(2024, 1, 2), u, "purchase"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    r = pevents.ab_test_report(df, salt="t1").collect()[0]
    assert r["n_a"] + r["n_b"] == 40
    assert r["conv_a"] + r["conv_b"] == 10
    assert r["rate_a_ppm"] == r["conv_a"] * 1_000_000 // r["n_a"]
    # arm assignment is the documented md5 bucket (replayable)
    arms = {
        row["u"]: row["arm"]
        for row in df.select(F.col("user_id").alias("u"))
        .distinct()
        .select("u", _hash_bucket("u", "t1", 2).alias("arm"))
        .collect()
    }
    assert r["n_a"] == sum(1 for a in arms.values() if a == 0)


def test_pii_report_counts_docs_not_matches(spark):
    from samza_spark.pipeline import text as ptext

    docs = [
        (1, "s1", "mail me at a@b.com or c@d.org"),   # 1 doc, 2 emails
        (2, "s1", "visit https://x.y/z now"),
        (3, "s1", "clean text"),
        (4, "s2", "call +1-555-123-4567"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    out = {r["source"]: r for r in ptext.pii_report(df).collect()}
    s1 = out["s1"]
    assert (s1["n_docs"], s1["n_email"], s1["n_url"]) == (3, 1, 1)
    assert s1["email_ppm"] == 1_000_000 // 3
    assert out["s2"]["n_phone"] == 1


# ---------------------------------------------------------------------------
# table_profile / nearest_event_join / knn_label_noise
# ---------------------------------------------------------------------------


def test_table_profile_metrics(spark):
    from samza_spark.pipeline import quality

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], "k long, s string"
    )
    out = {r["col"]: r for r in quality.table_profile(df).collect()}
    assert (out["k"]["n_rows"], out["k"]["n_null"], out["k"]["n_distinct"]) == (
        3, 0, 2,
    )
    assert (out["s"]["n_null"], out["s"]["n_distinct"]) == (1, 2)
    assert out["s"]["min_str"] == "a" and out["s"]["max_str"] == "b"


def test_nearest_event_join_directions_and_tie(spark):
    from samza_spark.pipeline import events as pevents

    rows = [
        # user 1: purchase at t=10 and t=30; views at 12 (back), 29
        # (forward), 20 (tie -> backward)
        (1, _ts(0, 10), 1, "purchase"),
        (2, _ts(0, 12), 1, "view"),
        (3, _ts(0, 20), 1, "view"),
        (4, _ts(0, 29), 1, "view"),
        (5, _ts(0, 30), 1, "purchase"),
        # user 2: view with no purchase at all
        (6, _ts(0, 5), 2, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        r["left_id"]: r
        for r in pevents.nearest_event_join(df, "view", "purchase").collect()
    }
    assert out[2]["nearest_id"] == 1 and out[2]["delta_us"] == -2_000_000
    assert out[4]["nearest_id"] == 5 and out[4]["delta_us"] == 1_000_000
    assert out[3]["nearest_id"] == 1  # equidistant -> backward
    assert out[6]["nearest_id"] is None and out[6]["delta_us"] is None


def test_knn_label_noise_flags_disagreement(spark):
    from samza_spark.pipeline import similarity as sim

    # two tight clusters along different axes; vec 99 sits in cluster A
    # but carries cluster B's label -> flagged
    rows = []
    for i in range(6):
        rows.append((i, [10.0 + i * 0.01, 0.0], 0))
    for i in range(6, 12):
        rows.append((i, [0.0, 5.0 + i * 0.01], 1))
    rows.append((99, [10.0, 0.05], 1))  # mislabeled A-cluster point
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {
        r["vec_id"]: r for r in sim.knn_label_noise(df, k=5).collect()
    }
    assert out[99]["flagged"] and out[99]["majority_label"] == 0
    assert not out[0]["flagged"]
    assert out[0]["majority_votes"] == 5


# ---------------------------------------------------------------------------
# running_balance / revenue_reconciliation
# ---------------------------------------------------------------------------


def test_running_balance_clamps_at_floor(spark):
    from samza_spark.pipeline import events as pevents

    # deltas in time order: +10, -25 (clamp to 0), +5, -2 -> final 3, 1 clamp
    rows = [
        (1, _ts(0), 1, 10),
        (2, _ts(1), 1, -25),
        (3, _ts(2), 1, 5),
        (4, _ts(3), 1, -2),
        # user 2 never clamps
        (5, _ts(0), 2, 7),
        (6, _ts(1), 2, -3),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, d long"
    )
    out = {r["user_id"]: r for r in pevents.running_balance(df, "d").collect()}
    assert (out[1]["final_balance"], out[1]["n_clamps"], out[1]["n_events"]) == (
        3, 1, 4,
    )
    assert (out[2]["final_balance"], out[2]["n_clamps"]) == (4, 0)
    # clamping is NOT the raw sum: -12 raw vs 3 clamped
    assert out[1]["final_balance"] != 10 - 25 + 5 - 2


def test_revenue_reconciliation_detects_planted_mismatch(spark):
    from samza_spark.pipeline import quality

    orders = spark.createDataFrame(
        [(1, 100.00), (2, 50.00)], "o_orderkey long, o_totalprice double"
    )
    # order 1 reconciles exactly (no disc/tax); order 2 is short 10.00
    li = spark.createDataFrame(
        [(1, 60.00, 0.0, 0.0), (1, 40.00, 0.0, 0.0), (2, 40.00, 0.0, 0.0)],
        "l_orderkey long, l_extendedprice double, l_discount double, l_tax double",
    )
    out = {r["o_orderkey"]: r for r in quality.revenue_reconciliation(orders, li).collect()}
    assert out[1]["delta_u"] == 0
    assert out[2]["delta_u"] == -10_00 * 10000  # 10 currency short, µ-units


# ---------------------------------------------------------------------------
# skyline_2d / skew_gini / cohort_ltv
# ---------------------------------------------------------------------------


def test_skyline_2d_matches_brute_force(spark):
    from samza_spark.pipeline import stats as pstats

    pts = [(i, (i * 7919) % 50, (i * 104729) % 40) for i in range(120)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {r["id"] for r in pstats.skyline_2d(df, "x", "y", "id").collect()}
    want = {
        i
        for i, x, y in pts
        if not any(
            (x2 >= x and y2 >= y and (x2 > x or y2 > y))
            for _, x2, y2 in pts
        )
    }
    assert got == want and got


def test_skyline_2d_ties_survive_together(spark):
    from samza_spark.pipeline import stats as pstats

    df = spark.createDataFrame(
        [(1, 5, 5), (2, 5, 5), (3, 5, 4), (4, 1, 9)], "id long, x long, y long"
    )
    got = {r["id"] for r in pstats.skyline_2d(df, "x", "y", "id").collect()}
    assert got == {1, 2, 4}  # exact-tie pair both survive; (5,4) dominated


def test_skew_gini_extremes(spark):
    from samza_spark.pipeline import stats as pstats

    even = spark.createDataFrame([(k,) for k in range(10) for _ in range(5)], "k long")
    r = pstats.skew_gini(even, "k").collect()[0]
    assert r["gini_ppm"] == 0 and r["n_keys"] == 10 and r["n_rows"] == 50
    skewed = spark.createDataFrame(
        [(0,)] * 96 + [(1,), (2,), (3,), (4,)], "k long"
    )
    r2 = pstats.skew_gini(skewed, "k").collect()[0]
    assert r2["gini_ppm"] > 700_000  # one key owns 96%


def test_cohort_ltv_accumulates(spark):
    import datetime as dt

    from samza_spark.pipeline import events as pevents

    d = lambda day, h=0: dt.datetime(2024, 1, day, h)  # noqa: E731
    rows = [
        # user 1 enters week0 (jan 1), buys 10.00 week0 and 5.00 week1
        (1, d(1), 1, "view", 0.0),
        (2, d(2), 1, "purchase", 10.0),
        (3, d(9), 1, "purchase", 5.0),
        # user 2 enters week1, buys 2.00 week1
        (4, d(9), 2, "purchase", 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {
        (r["cohort"], r["offset"]): r for r in pevents.cohort_ltv(df).collect()
    }
    cohorts = sorted({c for c, _ in out})
    c0, c1 = cohorts[0], cohorts[-1]
    assert out[(c0, 0)]["revenue_cents"] == 1000
    assert out[(c0, 1)]["cum_revenue_cents"] == 1500
    assert out[(c1, 0)]["revenue_cents"] == 200


# ---------------------------------------------------------------------------
# temporal_reachability / doc_structure / slo_burn_alerts
# ---------------------------------------------------------------------------


def test_temporal_reachability_respects_time(spark):
    from samza_spark.pipeline import graph

    # 1 -t5-> 2 -t3-> 3 : static BFS reaches 3, temporal must NOT
    # (edge to 3 fired before arrival at 2); 2 -t7-> 4 IS reachable
    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 3), (2, 4, 7)], "src long, dst long, t long"
    )
    seeds = spark.createDataFrame([(1,)], "src long")
    out = {r["node"]: r for r in graph.temporal_reachability(edges, seeds, max_hops=3).collect()}
    assert set(out) == {1, 2, 4}
    assert out[2]["arrival_us"] == 5 and out[2]["hops"] == 1
    assert out[4]["arrival_us"] == 7 and out[4]["hops"] == 2


def test_temporal_reachability_earlier_arrival_wins(spark):
    from samza_spark.pipeline import graph

    # two paths to node 3: via 2 arriving t=10, direct at t=2; min kept
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 10), (1, 3, 2)], "src long, dst long, t long"
    )
    seeds = spark.createDataFrame([(1,)], "src long")
    out = {r["node"]: r for r in graph.temporal_reachability(edges, seeds, max_hops=2).collect()}
    assert out[3]["arrival_us"] == 2 and out[3]["hops"] == 1


def test_doc_structure_counts(spark):
    from samza_spark.pipeline import text as ptext

    docs = [
        (1, "s", "# Title\n- a\n- b\n```\ncode\n```\ntail"),
        (2, "s", "plain prose only"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    r = ptext.doc_structure(df).collect()[0]
    assert (r["n_docs"], r["n_headers"], r["n_bullets"], r["n_fences"]) == (
        2, 1, 2, 2,
    )
    assert r["docs_with_code"] == 1 and r["code_ppm"] == 500_000


def test_slo_burn_alerts_requires_both_windows(spark):
    import datetime as dt

    from samza_spark.pipeline import events as pevents

    rows, eid = [], 0
    # hours 0..5: clean (no errors). hour 6: 100% errors but long window
    # still diluted below threshold -> depends; hours 7-11 also all
    # errors -> long window saturates -> alerts fire late hours only
    for h in range(12):
        err = h >= 6
        for j in range(10):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, 1, h, j), 1,
                 "error" if err else "view")
            )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = sorted(
        r["hour_s"] for r in pevents.slo_burn_alerts(
            df, short_thr_ppm=500_000, long_thr_ppm=500_000
        ).collect()
    )
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    # long (6h) window crosses 50% once 4 of its 6 hours are all-error
    assert out and out[0] == base + 9 * 3600
    assert out == [base + h * 3600 for h in (9, 10, 11)]


# ---------------------------------------------------------------------------
# rfm_segments / standing_queries
# ---------------------------------------------------------------------------


def test_rfm_segments_scores(spark):
    import datetime as dt

    from samza_spark.pipeline import events as pevents

    d = lambda day: dt.datetime(2024, 1, day)  # noqa: E731
    rows, eid = [], 0
    # 5 users: user i purchases (i+1) times, last on day 20-i*4, 10.00 each
    for u in range(5):
        for j in range(u + 1):
            eid += 1
            rows.append((eid, d(20 - u * 4 + 0), u, "purchase", 10.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["user_id"]: r for r in pevents.rfm_segments(df).collect()}
    # user 0: most recent (recency 0) -> r_score 1 -> R digit 5;
    # but lowest frequency/monetary -> F,M digits 1
    assert out[0]["recency_days"] == 0 and out[0]["segment"] == 511
    # user 4: oldest but highest freq+monetary -> 155
    assert out[4]["frequency"] == 5 and out[4]["segment"] == 155


def test_standing_queries_conjunction(spark):
    from samza_spark.pipeline import retrieval

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha delta"),
            (3, "beta gamma"),
        ],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame(
        [("q1", ["alpha", "beta"]), ("q2", ["gamma"]), ("q3", ["alpha", "zzz"])],
        "query_id string, terms array<string>",
    )
    got = {
        (r["query_id"], r["doc_id"])
        for r in retrieval.standing_queries(docs, qdf).collect()
    }
    assert got == {("q1", 1), ("q2", 1), ("q2", 3)}


# ---------------------------------------------------------------------------
# category_entropy / peak_concurrency
# ---------------------------------------------------------------------------


def test_category_entropy_uniform_vs_single(spark):
    import math

    from samza_spark.pipeline import stats as pstats

    rows = [("u", c) for c in "abcd" for _ in range(5)] + [("s", "x")] * 8
    df = spark.createDataFrame(rows, "g string, c string")
    out = {r["g"]: r for r in pstats.category_entropy(df, "g", "c").collect()}
    assert out["s"]["entropy_micronats"] == 0
    # uniform over 4 -> ln(4) nats (floored micro terms)
    want = (20 * 5 * math.floor(math.log(4) * 1e6)) // (4 * 5 * 20 // 4) // 5
    assert abs(out["u"]["entropy_micronats"] - math.log(4) * 1e6) < 5
    assert out["u"]["n_categories"] == 4


def test_peak_concurrency_sweep(spark):
    from samza_spark.pipeline import stats as pstats

    iv = spark.createDataFrame(
        [(0, 100), (10, 50), (20, 30), (25, 28), (100, 110)],
        "start_us long, end_us long",
    )
    r = pstats.peak_concurrency(iv).collect()[0]
    # at t=25: [0,100) [10,50) [20,30) [25,28) all active -> 4
    assert (r["peak_concurrency"], r["at_us"]) == (4, 25)
    # half-open: interval ending at 100 does NOT overlap one starting at 100
    iv2 = spark.createDataFrame([(0, 100), (100, 200)], "start_us long, end_us long")
    assert pstats.peak_concurrency(iv2).collect()[0]["peak_concurrency"] == 1


# ---------------------------------------------------------------------------
# merkle_manifest / funnel_with_exclusion
# ---------------------------------------------------------------------------


def test_merkle_manifest_localizes_changes(spark):
    from samza_spark.pipeline import versioning

    a = spark.createDataFrame(
        [(1, "s1", "x"), (2, "s1", "y"), (3, "s2", "z")],
        "doc_id long, source string, text string",
    )
    b = spark.createDataFrame(
        [(1, "s1", "x"), (2, "s1", "y"), (3, "s2", "CHANGED")],
        "doc_id long, source string, text string",
    )
    ma = {r["shard"]: r for r in versioning.merkle_manifest(a, "source", cmp_cols=["doc_id", "text"]).collect()}
    mb = {r["shard"]: r for r in versioning.merkle_manifest(b, "source", cmp_cols=["doc_id", "text"]).collect()}
    assert ma["s1"]["shard_root"] == mb["s1"]["shard_root"]
    assert ma["s2"]["shard_root"] != mb["s2"]["shard_root"]
    assert ma["s1"]["corpus_root"] != mb["s1"]["corpus_root"]
    # row order inside a shard does not change the root
    a_shuf = a.orderBy(F.desc("doc_id"))
    ms = {r["shard"]: r for r in versioning.merkle_manifest(a_shuf, "source", cmp_cols=["doc_id", "text"]).collect()}
    assert ms["s1"]["corpus_root"] == ma["s1"]["corpus_root"]


def test_funnel_exclusion_veto_kills_step(spark):
    from samza_spark.pipeline import events as pevents

    rows = [
        # user 1: view(0) click(10) purchase(20) — clean, reaches 3
        (1, _ts(0), 1, "view"), (2, _ts(10), 1, "click"), (3, _ts(20), 1, "purchase"),
        # user 2: view(0) ERROR(5) click(10) — error between view and click
        (4, _ts(0), 2, "view"), (5, _ts(5), 2, "error"), (6, _ts(10), 2, "click"),
        # user 3: error BEFORE the funnel starts is harmless
        (7, _ts(0), 3, "error"), (8, _ts(1), 3, "view"), (9, _ts(2), 3, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        r["user_id"]: r["step_reached"]
        for r in pevents.funnel_with_exclusion(
            df, ["view", "click", "purchase"], ["error"]
        ).collect()
    }
    assert out == {1: 3, 2: 1, 3: 2}


# ---------------------------------------------------------------------------
# churn_analysis / activity_streaks
# ---------------------------------------------------------------------------


def test_churn_analysis_flux(spark):
    import datetime as dt

    from samza_spark.pipeline import events as pevents

    # day-period: users {1,2} day0; {2,3} day1; {3} day2
    d = lambda day: dt.datetime(1970, 1, 1 + day)  # noqa: E731
    rows = [
        (1, d(0), 1), (2, d(0), 2),
        (3, d(1), 2), (4, d(1), 3),
        (5, d(2), 3),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = {r["period"]: r for r in pevents.churn_analysis(df, period="day").collect()}
    assert (out[0]["retained"], out[0]["churned"], out[0]["new_users"]) == (1, 1, 1)
    assert (out[1]["retained"], out[1]["churned"], out[1]["new_users"]) == (1, 1, 0)
    assert 2 not in out  # last period has no successor


def test_activity_streaks_islands(spark):
    import datetime as dt

    from samza_spark.pipeline import events as pevents

    d = lambda day: dt.datetime(1970, 1, 1 + day)  # noqa: E731
    rows = []
    eid = 0
    # user 1: days 0,1,2 then 5,6 -> longest 3, current 2
    for day in [0, 1, 2, 5, 6]:
        eid += 1
        rows.append((eid, d(day), 1))
    # duplicate events same day must not inflate streaks
    rows.append((99, d(6), 1))
    # user 2: single day
    rows.append((100, d(3), 2))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = {r["user_id"]: r for r in pevents.activity_streaks(df).collect()}
    assert (out[1]["longest_streak"], out[1]["current_streak"], out[1]["n_streaks"]) == (3, 2, 2)
    assert out[1]["last_active_day"] == 6
    assert (out[2]["longest_streak"], out[2]["current_streak"]) == (1, 1)


# ---------------------------------------------------------------------------
# matryoshka_eval
# ---------------------------------------------------------------------------


def test_matryoshka_full_prefix_is_perfect_recall(spark):
    from samza_spark.pipeline import similarity as sim

    rows = [
        (i, [float((i * j * 37) % 11 - 5) for j in range(1, 9)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 5)
    out = {
        r["prefix_dim"]: r
        for r in sim.matryoshka_eval(df, q, prefix_dims=(8, 2), k=5).collect()
    }
    # prefix == full dim -> identical ranking -> recall 1
    assert out[8]["recall_ppm"] == 1_000_000
    assert out[8]["overlap"] == 25 and out[8]["n_queries"] == 5
    # 2-dim prefix loses information -> recall <= 1, counts consistent
    assert 0 <= out[2]["overlap"] <= 25
    assert out[2]["recall_ppm"] == out[2]["overlap"] * 1_000_000 // 25


# ---------------------------------------------------------------------------
# diff_in_diff / winsorize_stats
# ---------------------------------------------------------------------------


def test_diff_in_diff_cells(spark):
    from samza_spark.pipeline import stats as pstats

    # control flat at 1.00; treatment 1.00 pre -> 3.00 post: DiD = +2.00
    rows = (
        [(0, 0, 1.0)] * 4 + [(0, 1, 1.0)] * 4
        + [(1, 0, 1.0)] * 4 + [(1, 1, 3.0)] * 4
    )
    df = spark.createDataFrame(rows, "tr int, po int, value double")
    r = pstats.diff_in_diff(df, "tr", "po", "value").collect()[0]
    assert r["did_micro"] == 200 * 1_000_000
    assert r["m_c_pre"] == r["m_c_post"] == 100 * 1_000_000
    assert r["n_total"] == 16


def test_winsorize_clamps_outliers(spark):
    from samza_spark.pipeline import stats as pstats

    # 20 values 1..20 plus one huge outlier; p95 bound tames it
    rows = [("g", i, float(i)) for i in range(1, 21)] + [("g", 99, 10000.0)]
    df = spark.createDataFrame(rows, "g string, id long, value double")
    r = pstats.winsorize_stats(df, "g", "value", "id").collect()[0]
    # n=21: lo rank = 1 + (20*5)//100 = 2 -> 2.0; hi rank = 1+(20*95)//100=20 -> 20.0
    want_sum = (2 + sum(range(2, 21)) + 20) * 1_000_000
    assert r["winsorized_sum_u"] == want_sum
    assert r["n"] == 21


# ---------------------------------------------------------------------------
# labeler_agreement
# ---------------------------------------------------------------------------


def test_labeler_agreement_kappa(spark):
    from samza_spark.pipeline import stats as pstats

    # 8 docs: 6 agree; marginals A: {x:4, y:4}, B: {x:5, y:3}
    rows = [("x", "x")] * 4 + [("y", "y")] * 2 + [("y", "x")] * 1 + [("x", "y")] * 0 + [("y", "x")] * 1
    df = spark.createDataFrame(rows, "a string, b string")
    r = pstats.labeler_agreement(df, "a", "b").collect()[0]
    n, agree = 8, 6
    po = agree * 1_000_000 // n
    pe = (4 * 6 + 4 * 2) * 1_000_000 // (n * n)
    assert (r["n"], r["agree"], r["po_ppm"], r["pe_ppm"]) == (n, agree, po, pe)
    assert r["kappa_ppm"] == (po - pe) * 1_000_000 // (1_000_000 - pe)
    # perfect agreement with >1 label -> kappa 1
    perfect = spark.createDataFrame([("x", "x")] * 3 + [("y", "y")] * 3, "a string, b string")
    assert pstats.labeler_agreement(perfect, "a", "b").collect()[0]["kappa_ppm"] == 1_000_000


# ---------------------------------------------------------------------------
# concordance
# ---------------------------------------------------------------------------


def test_concordance_contexts(spark):
    from samza_spark.pipeline import text as ptext

    df = spark.createDataFrame(
        [(1, "alpha beta TARGET gamma delta epsilon TARGET")],
        "doc_id long, text string",
    )
    out = ptext.concordance(df, "target", context=2).collect()
    assert [(r["pos"], r["left_ctx"], r["right_ctx"]) for r in out] == [
        (2, "alpha beta", "gamma delta"),
        (6, "delta epsilon", ""),
    ]
    # context clipped at doc start
    df2 = spark.createDataFrame([(1, "target tail")], "doc_id long, text string")
    r = ptext.concordance(df2, "target", context=3).collect()[0]
    assert r["left_ctx"] == "" and r["right_ctx"] == "tail"


# ---------------------------------------------------------------------------
# latency_log2_histogram / path_deviation
# ---------------------------------------------------------------------------


def test_log2_histogram_buckets_exact(spark):
    import datetime as dt

    from samza_spark.pipeline import events as pevents

    base = dt.datetime(2024, 1, 1)
    # gaps: 1s, 2s, 3s -> µs buckets floor(log2(1e6))=19, log2(2e6)=20, log2(3e6)=21
    offs = [0, 1, 3, 6]
    rows = [(i, base + dt.timedelta(seconds=offs[i]), "x") for i in range(4)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {r["log2_bucket"]: r for r in pevents.latency_log2_histogram(df).collect()}
    assert out[19]["n"] == 1 and out[19]["min_gap_us"] == 1_000_000
    assert out[20]["n"] == 1 and out[21]["n"] == 1
    assert (3_000_000).bit_length() - 1 == 21


def test_path_deviation_distances(spark):
    from samza_spark.pipeline import events as pevents

    rows = [
        # user 1 one session: exact canonical path "vcp" -> distance 0
        (1, _ts(0), 1, "view"), (2, _ts(1), 1, "click"), (3, _ts(2), 1, "purchase"),
        # user 2: "vep" -> distance 1 to "vcp"
        (4, _ts(0), 2, "view"), (5, _ts(1), 2, "error"), (6, _ts(2), 2, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r["user_id"]: r for r in pevents.path_deviation(df, "vcp").collect()}
    assert out[1]["path"] == "vcp" and out[1]["distance"] == 0
    assert out[2]["path"] == "vep" and out[2]["distance"] == 1


# ---------------------------------------------------------------------------
# mmr_select
# ---------------------------------------------------------------------------


def test_mmr_prefers_diversity_over_redundancy(spark):
    from samza_spark.pipeline import similarity as sim

    # query along x; two mutual near-clones slightly off-axis, and a
    # diverse candidate that still likes the query (sim 0.8) but points
    # AWAY from the clones (negative y). Plain top-2 takes both clones;
    # MMR's second pick must be the diverse one.
    rows = [
        (0, [1.0, 0.0]),          # query
        (1, [0.99, 0.14]),        # clone A
        (2, [0.99, 0.141]),       # clone B (near-duplicate of A)
        (3, [0.8, -0.6]),         # diverse: sim_q 0.8, sim_to_A ~0.71
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sim.mmr_select(df, query_id=0, k=2, lam=0.9).collect()
    assert out[0]["vec_id"] in (1, 2)
    assert out[1]["vec_id"] == 3
    assert out[0]["penalty"] == 0.0
    assert 0.6 < out[1]["penalty"] < 0.8


# ---------------------------------------------------------------------------
# trend_slopes / burstiness / abc_classification
# ---------------------------------------------------------------------------


def test_trend_slopes_detects_growth(spark):
    import datetime as dt

    from samza_spark.pipeline import stats as pstats

    rows, eid = [], 0
    # 'up' grows 2,4,6,8 per day; 'flat' constant 5
    for day in range(4):
        for _ in range(2 * (day + 1)):
            eid += 1
            rows.append((eid, dt.datetime(2024, 4, 1 + day), "up"))
        for _ in range(5):
            eid += 1
            rows.append((eid, dt.datetime(2024, 4, 1 + day), "flat"))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {r["event_type"]: r for r in pstats.trend_slopes(df).collect()}
    assert out["up"]["slope"] == 2.0
    assert out["flat"]["slope"] == 0.0 and out["flat"]["slope_num"] == 0


def test_burstiness_poisson_vs_bursty(spark):
    import datetime as dt

    from samza_spark.pipeline import stats as pstats

    rows, eid = [], 0
    # 'even': 4 events in each of 5 hours -> Fano = 0 (constant counts)
    for h in range(5):
        for _ in range(4):
            eid += 1
            rows.append((eid, dt.datetime(2024, 4, 1, h), "even"))
    # 'bursty': 20 events in one hour, 1 in each of 4 others
    for _ in range(20):
        eid += 1
        rows.append((eid, dt.datetime(2024, 4, 1, 0), "bursty"))
    for h in range(1, 5):
        eid += 1
        rows.append((eid, dt.datetime(2024, 4, 1, h), "bursty"))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {r["event_type"]: r for r in pstats.burstiness(df).collect()}
    assert out["even"]["fano_ppm"] == 0
    # var=(5*404-576)/25=57.76 mean=4.8 -> fano ~ 12.03
    assert out["bursty"]["fano_ppm"] == (5 * 404 - 24 * 24) * 1_000_000 // (5 * 24)


def test_abc_classification_boundaries(spark):
    from samza_spark.pipeline import governance

    # weights 80, 15, 4, 1 -> cumulative bp 8000, 9500, 9900, 10000
    rows = (
        [("s1", 1)] * 80 + [("s2", 1)] * 15 + [("s3", 1)] * 4 + [("s4", 1)]
    )
    df = spark.createDataFrame(rows, "source string, w long")
    out = {
        r["source"]: r["abc_class"]
        for r in governance.abc_classification(df, weight_col="w").collect()
    }
    assert out == {"s1": "A", "s2": "B", "s3": "C", "s4": "C"}


# ---------------------------------------------------------------------------
# concentration_hhi
# ---------------------------------------------------------------------------


def test_hhi_monopoly_vs_even(spark):
    from samza_spark.pipeline import governance

    rows = [("mono", "s1")] * 10 + [("even", m) for m in "abcd" for _ in range(5)]
    df = spark.createDataFrame(rows, "g string, m string")
    out = {r["g"]: r for r in governance.concentration_hhi(df, "g", "m").collect()}
    assert out["mono"]["hhi_ppm"] == 1_000_000
    assert out["even"]["hhi_ppm"] == 1_000_000 // 4
    assert out["even"]["n_members"] == 4


# ---------------------------------------------------------------------------
# fair_allocation
# ---------------------------------------------------------------------------


def test_fair_allocation_water_filling(spark):
    from samza_spark.pipeline import governance

    # demands: a=2, b=5, c=10, d=40; budget 20
    # a fully funded (2 + 2? check: sorted a(2) b(5) c(10) d(40));
    # a: 2 + 2*3 = 8 <= 20 funded; b: 7 + 5*2 = 17 <= 20 funded;
    # c: 17 + 10*1 = 27 > 20 unfunded -> level = (20-7)/2 = 6 rem 1
    rows = (
        [("a", 1)] * 2 + [("b", 1)] * 5 + [("c", 1)] * 10 + [("d", 1)] * 40
    )
    df = spark.createDataFrame(rows, "source string, w long")
    out = {
        r["source"]: r
        for r in governance.fair_allocation(
            df, 20, demand_col="w"
        ).collect()
    }
    assert out["a"]["alloc"] == 2 and out["a"]["funded"]
    assert out["b"]["alloc"] == 5 and out["b"]["funded"]
    # remainder goes to the first unfunded source (c before d)
    assert out["c"]["alloc"] == 7 and not out["c"]["funded"]
    assert out["d"]["alloc"] == 6
    assert sum(r["alloc"] for r in out.values()) == 20  # exact conservation
    # budget >= total demand: everyone fully funded
    out2 = {
        r["source"]: r["alloc"]
        for r in governance.fair_allocation(df, 1000, demand_col="w").collect()
    }
    assert out2 == {"a": 2, "b": 5, "c": 10, "d": 40}
