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


def test_streaming_drift_monitor_flags_skewed_batch(spark, tmp_path):
    import datetime as dt

    from samza_spark.streaming.alerts import streaming_drift_monitor

    t0 = dt.datetime(2024, 1, 1)
    schema = "event_id long, ts timestamp, event_type string"
    src = str(tmp_path / "drift_src")
    # batch 1 matches the 50/50 reference
    b1 = [(i, t0, "view" if i % 2 == 0 else "click") for i in range(100)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    fired = []
    writer, records = streaming_drift_monitor(
        stream,
        {"view": 500_000, "click": 500_000},
        threshold_ppm=200_000,
        on_alert=fired.append,
        checkpoint=str(tmp_path / "drift_ck"),
    )
    q = writer.start()
    try:
        q.processAllAvailable()
        # batch 2 is 90/10 plus a category the reference never saw
        b2 = [(1000 + i, t0, "view" if i < 90 else "error") for i in range(100)]
        spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(records) == 2
    assert records[0]["tvd_ppm"] == 0 and not records[0]["alert"]
    # batch 2: p = {view: 900k, error: 100k}; TVD = (|900-500| + |0-500| + |100-0|)/2 = 500k
    assert records[1]["tvd_ppm"] == 500_000 and records[1]["alert"]
    assert fired == [records[1]]


def test_streaming_lateness_monitor_flags_cross_batch_late_record(spark, tmp_path):
    from samza_spark.streaming.alerts import streaming_lateness_monitor

    src = str(tmp_path / "late_src")
    state = str(tmp_path / "late_state")
    ck1, ck2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")
    schema = "event_id long, ts timestamp, k string"
    base = datetime(2026, 1, 1)

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # wave 1: in-order events up to minute 100
    write([(i, base + timedelta(minutes=i), "a") for i in range(100)])
    stream = spark.readStream.schema(schema).parquet(src)
    w, recs = streaming_lateness_monitor(
        stream,
        key_col="k",
        ts_col="ts",
        watermark_delay_us=30 * 60 * 1_000_000,  # 30-minute watermark
        state_path=state,
        checkpoint=ck1,
    )
    q = w.trigger(availableNow=True).start()
    q.awaitTermination(60)
    assert recs and not any(r["alert"] for r in recs)  # first wave clean

    # wave 2 (fresh query, restored HWM state): one record 60 min late
    write([(200, base + timedelta(minutes=101), "a"),
           (201, base + timedelta(minutes=40), "a")])
    w2, recs2 = streaming_lateness_monitor(
        spark.readStream.schema(schema).parquet(src),
        key_col="k",
        ts_col="ts",
        watermark_delay_us=30 * 60 * 1_000_000,
        state_path=state,
        checkpoint=ck2,
    )
    q2 = w2.trigger(availableNow=True).start()
    q2.awaitTermination(60)
    flagged = [r for r in recs2 if r["alert"]]
    assert flagged, recs2
    # the 40-minute-old record is 59 minutes behind the stored HWM (99)
    assert flagged[-1]["n_dropped_by_watermark"] >= 1
    assert flagged[-1]["max_late_us"] >= 50 * 60 * 1_000_000
