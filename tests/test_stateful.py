"""Triggered-window semantics (SURVEY.md §2.2): count triggers,
ACCUMULATING vs DISCARDING panes — batch replay path (the deterministic
definition the streaming operator is tested against)."""

import datetime as dt

from pyspark.sql import functions as F

from samza_spark.operators.windows import AccumulationMode, Triggers, Windows
from samza_spark.streaming.stateful import AggSpec, triggered_window_batch


def ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


def make_events(spark, n, key="k", start_min=0):
    rows = [(key, ts(start_min, i)) for i in range(n)]
    return spark.createDataFrame(rows, "k string, t timestamp")


def test_count_trigger_discarding(spark):
    spec = (
        Windows.keyed_tumbling_window("k", "t", "1 hour")
        .set_early_trigger(Triggers.count(3))
        .set_accumulation_mode(AccumulationMode.DISCARDING)
    )
    df = make_events(spark, 8)
    out = triggered_window_batch(df, spec, [AggSpec("n", "count")]).collect()
    panes = sorted((r.pane_seq, r.n, r.fire_reason, r.is_final) for r in out)
    assert panes == [
        (0, 3, "count(3)", False),
        (1, 3, "count(3)", False),
        (2, 2, "window_close", True),
    ]


def test_count_trigger_accumulating(spark):
    spec = (
        Windows.keyed_tumbling_window("k", "t", "1 hour")
        .set_early_trigger(Triggers.count(3))
        .set_accumulation_mode(AccumulationMode.ACCUMULATING)
    )
    df = make_events(spark, 7)
    out = triggered_window_batch(df, spec, [AggSpec("n", "count")]).collect()
    panes = sorted((r.pane_seq, r.n, r.is_final) for r in out)
    # accumulating: each pane includes all prior messages of the window
    assert panes == [(0, 3, False), (1, 6, False), (2, 7, True)]


def test_no_trigger_single_close_pane(spark):
    spec = Windows.keyed_tumbling_window("k", "t", "1 hour").set_accumulation_mode(
        AccumulationMode.DISCARDING
    )
    df = make_events(spark, 5)
    out = triggered_window_batch(df, spec, [AggSpec("n", "count")]).collect()
    assert [(r.n, r.fire_reason, r.is_final) for r in out] == [(5, "window_close", True)]


def test_panes_respect_window_boundaries(spark):
    spec = (
        Windows.keyed_tumbling_window("k", "t", "10 minutes")
        .set_early_trigger(Triggers.count(4))
        .set_accumulation_mode(AccumulationMode.DISCARDING)
    )
    rows = [("k", ts(0, 0)), ("k", ts(1, 0)), ("k", ts(11, 0)), ("k", ts(12, 0))]
    df = spark.createDataFrame(rows, "k string, t timestamp")
    out = triggered_window_batch(df, spec, [AggSpec("n", "count")]).collect()
    # two windows, neither reaches the count trigger -> two close panes of 2
    assert sorted((r.window_start.minute, r.n) for r in out) == [(0, 2), (10, 2)]


def test_sum_and_avg_aggs(spark):
    spec = Windows.keyed_tumbling_window("k", "t", "1 hour").set_early_trigger(
        Triggers.count(100)  # never fires; single close pane
    )
    rows = [("k", ts(0, i), float(i)) for i in range(4)]
    df = spark.createDataFrame(rows, "k string, t timestamp, v double")
    out = triggered_window_batch(
        df, spec, [AggSpec("s", "sum", "v"), AggSpec("m", "max", "v"), AggSpec("a", "avg", "v")]
    ).collect()
    [row] = out
    assert row.s == 6.0 and row.m == 3.0 and row.a == 1.5


def test_session_window_batch_panes(spark):
    spec = Windows.keyed_session_window("k", "t", "5 minutes").set_accumulation_mode(
        AccumulationMode.DISCARDING
    )
    rows = [("k", ts(0)), ("k", ts(2)), ("k", ts(20)), ("k", ts(21))]
    df = spark.createDataFrame(rows, "k string, t timestamp")
    out = triggered_window_batch(df, spec, [AggSpec("n", "count")]).collect()
    assert sorted(r.n for r in out) == [2, 2]  # two sessions of two events
