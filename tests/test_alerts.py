"""Streaming hysteresis alerts (streaming/alerts.py): equivalence with
the batch window-pass analog and cross-trigger state carry."""

import tempfile
import time
from datetime import datetime, timedelta

from samza_spark.pipeline import events as ev
from samza_spark.streaming.alerts import streaming_hysteresis
from samza_spark.streaming.stateful import await_condition


def _frame(spark, seq, t0=datetime(2026, 1, 1), user=1, start_id=0):
    rows = [
        (start_id + i, t0 + timedelta(minutes=start_id + i), user, "m", v, "")
        for i, v in enumerate(seq)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _run_stream(spark, paths, name):
    src = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(paths)
    )
    return (
        streaming_hysteresis(src, hi=80.0, lo=20.0)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )


def test_streaming_matches_batch_single_trigger(spark):
    seq = [50.0, 90.0, 85.0, 95.0, 40.0, 10.0, 50.0, 99.0, 5.0, 81.0]
    df = _frame(spark, seq)
    want = sorted(
        (r["event_id"], r["ts_us"] if "ts_us" in r else None)
        for r in ev.hysteresis_alerts(df, hi=80.0, lo=20.0)
        .selectExpr("event_id", "unix_micros(ts) as ts_us")
        .collect()
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(f"{d}/in")
        q = _run_stream(spark, f"{d}/in", "hys1")
        assert await_condition(
            q,
            lambda: spark.sql("SELECT count(*) FROM hys1").first()[0]
            == len(want),
        )
        q.stop()
        got = sorted(
            (r["event_id"], r["ts_us"])
            for r in spark.sql("SELECT * FROM hys1").collect()
        )
    assert [g[0] for g in got] == [w[0] for w in want] == [1, 7, 9]


def test_state_carries_across_triggers(spark):
    # trigger 1 ends ON (95); trigger 2 stays in the dead band (no
    # re-alert) then drops below lo and crosses hi -> exactly one new alert
    with tempfile.TemporaryDirectory() as d:
        _frame(spark, [50.0, 95.0, 85.0], start_id=0).coalesce(1).write.parquet(
            f"{d}/in"
        )
        time.sleep(1.2)  # file-source orders by mod time: slice 2 after 1
        _frame(spark, [70.0, 30.0, 10.0, 90.0], start_id=3).coalesce(
            1
        ).write.mode("append").parquet(f"{d}/in")
        q = _run_stream(spark, f"{d}/in", "hys2")
        assert await_condition(
            q,
            lambda: spark.sql("SELECT count(*) FROM hys2").first()[0] == 2,
        )
        q.stop()
        got = sorted(r["event_id"] for r in spark.sql("SELECT * FROM hys2").collect())
    # alert at id 1 (first ON) and id 6 (re-arm after dropping below lo);
    # ids 3-4 (dead band / above-lo values while ON) never re-alert
    assert got == [1, 6]
