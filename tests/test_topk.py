"""Streaming windowed heavy hitters (streaming/topk.py)."""

import tempfile

from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F

from samza_spark.streaming.stateful import await_condition
from samza_spark.streaming.topk import (
    _ingest,
    streaming_top_k,
    top_k_exact_batch,
)


def test_space_saving_update_semantics():
    c: dict = {}
    for key in ["a", "a", "b", "c"]:
        _ingest(c, key, 1, capacity=2)
    # 'c' evicted the min counter ('b', count 1) and inherited its count
    assert set(c) == {"a", "c"}
    assert c["a"] == [2, 0]
    assert c["c"] == [2, 1]  # count_max 2, err 1 -> true count in [1, 2]
    # overestimate-only: every tracked count_max >= true count
    true = {"a": 2, "c": 1}
    for k, (cnt, err) in c.items():
        assert cnt >= true[k] >= cnt - err


def _events(spark):
    # two 1-hour windows; distinct skews per window
    rows = []
    base = datetime(2026, 1, 1, 10, 0, 0)
    for i, key in enumerate(["x"] * 5 + ["y"] * 3 + ["z"] * 1):
        rows.append((base + timedelta(seconds=i), key))
    base2 = datetime(2026, 1, 1, 11, 0, 0)
    for i, key in enumerate(["y"] * 4 + ["z"] * 2):
        rows.append((base2 + timedelta(seconds=i), key))
    return spark.createDataFrame(rows, "ts timestamp, k string")


def test_stream_matches_exact_when_capacity_suffices(spark):
    ev = _events(spark)
    with tempfile.TemporaryDirectory() as d:
        ev.repartition(3).write.parquet(f"{d}/in")
        src = spark.readStream.schema(ev.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(f"{d}/in")
        q = (
            streaming_top_k(
                src, key_col="k", ts_col="ts", window="1 hour", k=2, capacity=16
            )
            .writeStream.format("memory")
            .queryName("hh_panes")
            .outputMode("append")
            .start()
        )
        # ProcessingTimeTimeout keeps scheduling micro-batches, so drive by
        # sink condition + stop() (the repo's streaming-test idiom): done
        # when a pane holds the full first-window count for 'x' (5)
        assert await_condition(
            q,
            lambda: spark.sql(
                "SELECT max(count_max) FROM hh_panes WHERE key = 'x'"
            ).first()[0]
            == 5
            and spark.sql(
                "SELECT max(count_max) FROM hh_panes WHERE key = 'y'"
            ).first()[0]
            == 4,
        )
        q.stop()
        panes = spark.sql("SELECT * FROM hh_panes").toPandas()
    assert len(panes), "no panes emitted"
    # ACCUMULATING panes: the last pane per window is the window's answer
    last = panes.loc[
        panes.groupby("window_start")["pane_seq"].idxmax()
    ]
    final = panes[
        panes.window_start.isin(last.window_start)
    ].merge(last[["window_start", "pane_seq"]], on=["window_start", "pane_seq"])
    want = top_k_exact_batch(
        _events(spark), key_col="k", ts_col="ts", window="1 hour", k=2
    ).toPandas()
    got = {
        (r.window_start, r.rank): (r.key, r.count_min, r.count_max)
        for r in final.itertuples()
    }
    assert len(got) == len(want)
    for r in want.itertuples():
        key, lo, hi = got[(r.window_start, r.rank)]
        assert key == r.key
        assert lo == hi == r.count  # capacity >= distinct keys -> exact


def test_stream_bounded_state_overestimates_only(spark):
    """capacity smaller than the key domain: the true heavy hitter must
    still surface at rank 1 and its count bracket must contain truth."""
    rows = []
    base = datetime(2026, 1, 1, 10, 0, 0)
    i = 0
    for key, reps in [("hot", 30)] + [(f"t{j}", 1) for j in range(12)]:
        for _ in range(reps):
            rows.append((base + timedelta(seconds=i), key))
            i += 1
    ev = spark.createDataFrame(rows, "ts timestamp, k string")
    with tempfile.TemporaryDirectory() as d:
        ev.repartition(4).write.parquet(f"{d}/in")
        src = spark.readStream.schema(ev.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(f"{d}/in")
        q = (
            streaming_top_k(
                src, key_col="k", ts_col="ts", window="1 hour", k=3, capacity=4
            )
            .writeStream.format("memory")
            .queryName("hh_small")
            .outputMode("append")
            .start()
        )
        assert await_condition(
            q,
            lambda: (
                spark.sql(
                    "SELECT max(count_max) FROM hh_small WHERE key = 'hot'"
                ).first()[0]
                or 0
            )
            >= 30,
        )
        q.stop()
        panes = spark.sql("SELECT * FROM hh_small").toPandas()
    last_seq = panes.pane_seq.max()
    final = panes[panes.pane_seq == last_seq].sort_values("rank")
    top = final.iloc[0]
    assert top["key"] == "hot"
    assert top.count_min <= 30 <= top.count_max
