"""Streaming threshold alerting with hysteresis.

The continuous form of :func:`samza_spark.pipeline.events.
hysteresis_alerts`: per key, an ON/OFF automaton (ON above ``hi``, OFF
below ``lo``, the dead band holds the previous state) whose OFF→ON
edges are emitted as alert rows the moment the trigger that contains
them commits. State per key is ONE tiny value (the current automaton
state) — bounded regardless of traffic, the textbook
``applyInPandasWithState`` shape.

Each micro-batch chunk is sorted by event time (+ tiebreaker) before
replaying the automaton, so results are exact when events reach the
operator in event-time order ACROSS triggers (the per-partition
in-order delivery the reference guarantees per SSP —
/root/reference samza-core/.../container/RunLoop.java:78; Samza jobs
assume exactly this). Under cross-trigger disorder the batch analog
(one window pass over the settled history) is the reconciliation path —
the same lambda-style pairing every alerting pipeline runs.

Reference anchor: threshold monitors over keyed state are the canonical
low-level Samza task (StreamTask.process + KeyValueStore,
samza-api/.../task/StreamTask.java:38); here the state is a one-byte
automaton managed by Spark's state store with exactly-once replay.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_DDL = (
    "user_id long, event_id long, ts_us long, value double, state string"
)


def streaming_hysteresis(
    df: DataFrame,
    hi: float,
    lo: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Continuous OFF→ON alert edges per key. ``df`` is a streaming
    DataFrame with event-time ``ts_col``; output columns follow
    ``OUT_DDL``. State: one 'on'/'off' string per key, no timeout (keys
    are users — state is key-cardinality bounded; add a timeout wrapper
    if the key domain is unbounded)."""
    hi_f, lo_f = float(hi), float(lo)

    def fn(
        key, pdf_iter: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cur = state.get[0] if state.exists else "off"
        out_rows = []
        chunks = [p for p in pdf_iter if not p.empty]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["__ts_us", "__tb"])
            for ts_us, tb, val in zip(
                pdf["__ts_us"], pdf["__tb"], pdf["__val"]
            ):
                if val > hi_f:
                    nxt = "on"
                elif val < lo_f:
                    nxt = "off"
                else:
                    nxt = cur
                if nxt == "on" and cur == "off":
                    out_rows.append(
                        {
                            "user_id": key[0],
                            "event_id": int(tb),
                            "ts_us": int(ts_us),
                            "value": float(val),
                            "state": "on",
                        }
                    )
                cur = nxt
            state.update((cur,))
        yield pd.DataFrame(
            out_rows, columns=["user_id", "event_id", "ts_us", "value", "state"]
        )

    keyed = df.select(
        F.col(key_col).alias("__k"),
        F.unix_micros(F.col(ts_col)).alias("__ts_us"),
        F.col(tiebreak_col).cast("long").alias("__tb"),
        F.col(value_col).cast("double").alias("__val"),
    )
    return keyed.groupBy("__k").applyInPandasWithState(
        fn,
        OUT_DDL,
        "state string",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def streaming_drift_monitor(
    df: DataFrame,
    reference_ppm: "dict[str, int]",
    cat_col: str = "event_type",
    threshold_ppm: int = 100_000,
    on_alert=None,
    checkpoint: "str | None" = None,
):
    """Per-micro-batch distribution drift vs a reference mix — the
    real-time data-quality monitor a production ingest runs next to the
    pipeline (the streaming form of the batch ``tvd_drift`` audit):
    every trigger, the batch's category distribution is compared to
    ``reference_ppm`` (exact integer ppm shares summing to <= 1e6) by
    total variation distance; batches past ``threshold_ppm`` raise an
    alert record (and call ``on_alert`` if given).

    Arithmetic is exact: batch shares are integer ppm of the batch
    count, TVD = sum(|p - q|) div 2 over the category union. The only
    driver-side data is the per-batch CATEGORY COUNT table (bounded by
    category cardinality, never rows). Returns ``(writer, records)``:
    start the writer (``.start()``), read drift rows from ``records``
    as batches commit (driver-local telemetry, one dict per trigger).
    """
    records: list = []

    def process(batch_df, batch_id: int) -> None:
        counts = {
            r[0]: r[1]
            for r in batch_df.groupBy(cat_col).count().collect()
            if r[0] is not None
        }
        n = sum(counts.values())
        if n == 0:
            return
        cats = set(counts) | set(reference_ppm)
        tvd_ppm = (
            sum(
                abs((counts.get(c, 0) * 1_000_000) // n - reference_ppm.get(c, 0))
                for c in cats
            )
            // 2
        )
        rec = {
            "batch_id": int(batch_id),
            "n": int(n),
            "tvd_ppm": int(tvd_ppm),
            "alert": tvd_ppm > threshold_ppm,
        }
        records.append(rec)
        if on_alert is not None and rec["alert"]:
            on_alert(rec)

    writer = df.writeStream.foreachBatch(process).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer, records
