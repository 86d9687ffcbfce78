"""Streaming windowed heavy hitters: continuous per-window top-k over an
unbounded key domain in BOUNDED state.

A streaming `groupBy(window, key).count()` keeps one state row per
DISTINCT key per window — at web scale (urls, user ids, shingles) that
state is unbounded. The public fix is the space-saving sketch (Metwally
et al. ICDT'05, the Misra-Gries family): maintain at most ``capacity``
counters; an unseen key evicts the minimum counter and inherits its
count as error bound. Guarantees: every true count is within
[count - err, count], any key with true count > N/capacity is in the
sketch, and with capacity >= distinct-keys the counts are EXACT.

Reference anchor: Samza ships no sketch operator, but this is the
canonical "custom stateful operator" its low-level API is used for
(SURVEY.md §2.1 ScheduledFunction + KeyValueStore pattern:
/root/reference samza-api/.../scheduler/ScheduledFunction.java,
samza-kv/.../KeyValueStore.java) — expressed Spark-first as ONE
``applyInPandasWithState`` keyed by window start.

Scale shape: the micro-batch pre-aggregates per (window, key) map-side
(a plain pandas value_counts inside the Arrow chunk — no extra Spark
shuffle), the grouped state holds one ``capacity``-bounded dict per
OPEN window, and panes emit incrementally per trigger (Samza
ACCUMULATING panes). Closed windows leave state via ProcessingTimeTimeout.
"""

from __future__ import annotations

import json
import time as _time
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from samza_spark.streaming.stateful import _duration_ms

OUT_DDL = (
    "window_start timestamp, rank int, key string, "
    "count_min long, count_max long, pane_seq int, is_final boolean"
)


def _ingest(counts: dict, key: str, inc: int, capacity: int) -> None:
    """Space-saving update: counts[key] = [count, err]."""
    if key in counts:
        counts[key][0] += inc
    elif len(counts) < capacity:
        counts[key] = [inc, 0]
    else:
        victim = min(counts, key=lambda k: counts[k][0])
        base = counts.pop(victim)[0]
        counts[key] = [base + inc, base]


def _top_rows(counts: dict, k: int, ws_ms: int, seq: int, final: bool) -> list:
    # deterministic order: count desc, then key asc
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
    return [
        {
            "window_start": pd.Timestamp(ws_ms, unit="ms"),
            "rank": i + 1,
            "key": key,
            "count_min": cnt - err,
            "count_max": cnt,
            "pane_seq": seq,
            "is_final": final,
        }
        for i, (key, (cnt, err)) in enumerate(ranked)
    ]


def streaming_top_k(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window: str = "1 hour",
    k: int = 10,
    capacity: int = 1024,
    close_after: "str | None" = None,
) -> DataFrame:
    """Continuous top-``k`` keys per ``window`` of event time.

    Emits an ACCUMULATING pane per trigger per active window (rows
    ``window_start, rank, key, count_min, count_max, pane_seq,
    is_final``); a window fires its final pane ``close_after`` (default:
    one window span) of processing time after its last event, then its
    state is dropped. ``count_min == count_max`` rows are exact (always
    true when ``capacity`` exceeds the window's distinct-key count).
    """
    win_ms = _duration_ms(window)
    close_ms = _duration_ms(close_after) if close_after else win_ms

    def fn(
        key, pdf_iter: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ws_ms = int(key[0])
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"counts": {}, "seq": 0}
        counts = st["counts"]
        got_data = False
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            got_data = True
            # map-side combine within the Arrow chunk: one sketch update
            # per DISTINCT key, not per row
            for kv, inc in pdf["__key"].value_counts().items():
                _ingest(counts, str(kv), int(inc), capacity)
        out: list = []
        if got_data and counts:
            out = _top_rows(counts, k, ws_ms, st["seq"], False)
            st["seq"] += 1
            state.update((json.dumps(st),))
            state.setTimeoutDuration(close_ms)
        elif state.hasTimedOut or (not got_data and state.exists):
            out = _top_rows(counts, k, ws_ms, st["seq"], True)
            state.remove()
        yield pd.DataFrame(
            out,
            columns=[
                "window_start",
                "rank",
                "key",
                "count_min",
                "count_max",
                "pane_seq",
                "is_final",
            ],
        )

    bucketed = df.select(
        (
            (F.unix_micros(F.col(ts_col)) / 1000).cast("long")
            - ((F.unix_micros(F.col(ts_col)) / 1000).cast("long") % win_ms)
        ).alias("__ws"),
        F.col(key_col).cast("string").alias("__key"),
    )
    return bucketed.groupBy("__ws").applyInPandasWithState(
        fn,
        OUT_DDL,
        "payload string",
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def top_k_exact_batch(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window: str = "1 hour",
    k: int = 10,
) -> DataFrame:
    """Exact batch analog (the test/oracle reference for the stream):
    per-window counts + per-window top-k with the same (count desc, key
    asc) tie-break. Partial-aggregated count shuffle + a window-keyed
    rank over k-bounded groups."""
    win_ms = _duration_ms(window)
    ws = (
        (F.unix_micros(F.col(ts_col)) / 1000).cast("long")
        - ((F.unix_micros(F.col(ts_col)) / 1000).cast("long") % win_ms)
    ).alias("__ws")
    counted = (
        df.select(ws, F.col(key_col).cast("string").alias("key"))
        .groupBy("__ws", "key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window as W

    r = F.row_number().over(
        W.partitionBy("__ws").orderBy(F.col("cnt").desc(), F.col("key").asc())
    )
    return (
        counted.withColumn("rank", r)
        .where(F.col("rank") <= k)
        .select(
            F.timestamp_millis(F.col("__ws")).alias("window_start"),
            F.col("rank").cast("int"),
            "key",
            F.col("cnt").alias("count"),
        )
    )
