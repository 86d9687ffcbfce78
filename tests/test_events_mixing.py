"""Tests for event-sequence analytics (funnel, retention), mixture
resampling, and unigram LM scoring."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from samza_spark.pipeline import events as E, sampling
from samza_spark.pipeline.text import unigram_logprob


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def funnel_events(spark):
    rows = [
        # user 1: clean view -> click -> purchase
        (1, _ts(1), "view"),
        (1, _ts(2), "click"),
        (1, _ts(3), "purchase"),
        # user 2: click BEFORE first view -> ordered funnel stops at view
        (2, _ts(1), "click"),
        (2, _ts(2), "view"),
        # user 3: purchase before click -> reaches step 2 only
        (3, _ts(1), "view"),
        (3, _ts(2), "purchase"),
        (3, _ts(3), "click"),
        # user 4: never views but clicks -> step 0
        (4, _ts(1), "click"),
        (4, _ts(2), "purchase"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_funnel_ordering_semantics(spark, funnel_events):
    out = {
        r.user_id: r
        for r in E.funnel(funnel_events, ["view", "click", "purchase"]).collect()
    }
    assert out[1].step_reached == 3
    assert out[2].step_reached == 1 and out[2].t_click is None
    assert out[3].step_reached == 2 and out[3].t_purchase is None
    assert out[4].step_reached == 0 and out[4].t_view is None
    # step times are epoch-us and monotonically ordered for user 1
    assert out[1].t_view < out[1].t_click < out[1].t_purchase


def test_funnel_same_timestamp_counts(spark):
    # a step at exactly the previous step's time qualifies (>=)
    rows = [(1, _ts(1), "view"), (1, _ts(1), "click")]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = E.funnel(df, ["view", "click"]).collect()[0]
    assert out.step_reached == 2 and out.t_view == out.t_click


def test_funnel_summary_counts(spark, funnel_events):
    out = {
        r.step: r.n_users
        for r in E.funnel_summary(
            funnel_events, ["view", "click", "purchase"]
        ).collect()
    }
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_retention_cohorts_grid(spark):
    # two users: first active in week of Jan 1 2024; one returns 1 week
    # later, the other 2 weeks later; a third user starts a week late
    rows = [
        (1, _ts(1)), (1, _ts(8)),
        (2, _ts(2)), (2, _ts(16)),
        (3, _ts(9)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    grid = {
        (r.cohort, r.offset): r.n_users
        for r in E.retention_cohorts(df, "week").collect()
    }
    cohorts = {c for c, _ in grid}
    assert len(cohorts) == 2
    w0, w1 = sorted(cohorts)
    assert w1 == w0 + 1
    assert grid[(w0, 0)] == 2  # both week-0 users active in their cohort week
    assert grid[(w0, 1)] == 1  # user 1 returned next week
    assert grid[(w0, 2)] == 1  # user 2 returned two weeks later
    assert grid[(w1, 0)] == 1  # late-starting user forms its own cohort


def test_mixture_resample_respects_waterline(spark):
    rows = [(i, "en" if i < 200 else ("de" if i < 260 else "zh")) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.mixture_resample(df, {"en": 7000, "de": 3000}, "lang")
    counts = {r.lang: r.cnt for r in out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    # zh is not in the target mixture -> dropped entirely
    assert "zh" not in counts
    # water-line T = min(200/0.7, 60/0.3) = 200 -> de keeps everything
    # (threshold 10000 bp), en keeps ~70% of T
    assert counts["de"] == 60
    assert counts["en"] < 200
    # deterministic: same call returns the identical set
    again = sampling.mixture_resample(df, {"en": 7000, "de": 3000}, "lang")
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_mixture_resample_rejects_bad_weights(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        sampling.mixture_resample(df, {}, "lang")
    with pytest.raises(ValueError):
        sampling.mixture_resample(df, {"en": 9000, "de": 2000}, "lang")


def test_unigram_logprob_hand_computed(spark):
    # corpus: "a a b" and "b" -> counts a:2 b:2 total 4 -> p=0.5 each
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b"), (3, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in unigram_logprob(df).collect()}
    lp = math.log(0.5)
    assert out[1].n_tokens == 3
    assert out[1].logprob_sum == pytest.approx(3 * lp, rel=1e-12)
    assert out[1].avg_logprob == pytest.approx(lp, rel=1e-12)
    assert out[2].n_tokens == 1
    # empty doc: zero tokens, sum 0, avg NULL
    assert out[3].n_tokens == 0
    assert out[3].logprob_sum == 0.0 and out[3].avg_logprob is None


def test_funnel_rejects_empty_steps(spark, funnel_events):
    with pytest.raises(ValueError):
        E.funnel(funnel_events, [])


def test_sessionize_gap_semantics(spark):
    import datetime as dt
    from samza_spark.pipeline.events import sessionize

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, 100, t0),            # session 1
        (2, 100, t0 + 5 * m),    # gap 5m  -> same session
        (3, 100, t0 + 40 * m),   # gap 35m -> session 2
        (4, 100, t0 + 70 * m),   # gap 30m exactly -> SAME session (> gap starts new)
        (5, 200, t0),            # other user: own session 1
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r.event_id: r for r in sessionize(df, gap="30 minutes").collect()}
    assert [out[i].session_id for i in (1, 2, 3, 4)] == [1, 1, 2, 2]
    assert out[5].session_id == 1
    assert out[1].is_session_start and out[3].is_session_start
    assert not out[2].is_session_start and not out[4].is_session_start


# ---------------------------------------------------------------------------
# gap_fill
# ---------------------------------------------------------------------------


def test_gap_fill_grid_and_locf(spark):
    from datetime import datetime

    from samza_spark.pipeline.events import gap_fill

    rows = [
        # user 1: values at hours 0, 0 (later event wins), 3
        (1, 1, datetime(2024, 1, 1, 0, 10), 10.0),
        (2, 1, datetime(2024, 1, 1, 0, 50), 11.0),
        (3, 1, datetime(2024, 1, 1, 3, 5), 12.0),
        # user 2: single observation
        (4, 2, datetime(2024, 1, 1, 5, 0), 99.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {
        (r["user_id"], r["bucket_us"]): (r["value"], r["is_gap"])
        for r in gap_fill(df, step="1 hour").collect()
    }
    h = 3_600_000_000
    base = 1_704_067_200 * 1_000_000  # 2024-01-01 UTC in micros
    # user 1: 4 buckets, hours 1-2 forward-filled with the LAST hour-0 value
    assert out[(1, base + 0 * h)] == (11.0, False)
    assert out[(1, base + 1 * h)] == (11.0, True)
    assert out[(1, base + 2 * h)] == (11.0, True)
    assert out[(1, base + 3 * h)] == (12.0, False)
    # user 2: exactly one bucket, no fills
    u2 = [k for k in out if k[0] == 2]
    assert u2 == [(2, base + 5 * h)]
    assert out[u2[0]] == (99.0, False)
    assert len(out) == 5
