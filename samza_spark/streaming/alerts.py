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


def streaming_lateness_monitor(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    watermark_delay_us: int = 600_000_000,
    state_path: "str | None" = None,
    on_alert=None,
    checkpoint: "str | None" = None,
):
    """Per-trigger event-time lateness monitor — the live companion of
    the batch ``disorder_audit``: each micro-batch, every record's
    lateness is measured against the per-key event-time high-water mark
    PERSISTED ACROSS TRIGGERS, so a record arriving a batch (or a
    restart) after its successors is still seen as late. A batch that
    carries records later than ``watermark_delay_us`` — records a
    watermark of that delay would silently drop — raises an alert; the
    operator answer is to widen the watermark or fix the producer.

    Per trigger: the stored HWM table (one row per key — bounded state,
    the Samza KeyValueStore-per-task shape) broadcasts into ONE
    key-grouped aggregate over the batch (map-side combinable); the
    updated HWM is parquet/JSON-durable when ``state_path`` is set,
    surviving restarts like any changelog-backed store.

    Returns ``(writer, records)`` like the drift monitor.
    """
    import json as _json
    import os

    records: list = []
    hwm: dict = {}
    if state_path and os.path.isfile(os.path.join(state_path, "hwm.json")):
        with open(os.path.join(state_path, "hwm.json")) as fh:
            hwm.update({k: int(v) for k, v in _json.load(fh).items()})

    FLOOR = -(1 << 62)

    def process(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        keyed = batch_df.select(
            F.col(key_col).alias("k"), F.unix_micros(F.col(ts_col)).alias("us")
        )
        if hwm:
            hwm_df = spark.createDataFrame(
                [(k, v) for k, v in hwm.items()], "k string, hwm long"
            )
        else:
            hwm_df = spark.createDataFrame([], "k string, hwm long")
        stats = (
            keyed.join(F.broadcast(hwm_df), "k", "left")
            .select(
                "k",
                "us",
                (F.coalesce("hwm", F.lit(FLOOR)) - F.col("us")).alias("late_us"),
            )
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.max("us").alias("max_us"),
                F.max(F.greatest("late_us", F.lit(0))).alias("max_late_us"),
                F.sum(
                    (F.col("late_us") > watermark_delay_us).cast("long")
                ).alias("n_beyond"),
            )
            .collect()
        )
        for r in stats:
            if r["k"] is None:
                continue
            rec = {
                "batch_id": int(batch_id),
                "key": r["k"],
                "n": int(r["n"]),
                "max_late_us": int(r["max_late_us"]),
                "n_dropped_by_watermark": int(r["n_beyond"]),
                "alert": int(r["n_beyond"]) > 0,
            }
            records.append(rec)
            if on_alert is not None and rec["alert"]:
                on_alert(rec)
            hwm[r["k"]] = max(hwm.get(r["k"], FLOOR), int(r["max_us"]))
        if state_path:
            os.makedirs(state_path, exist_ok=True)
            tmp = os.path.join(state_path, "hwm.json.tmp")
            with open(tmp, "w") as fh:
                _json.dump(hwm, fh)
            os.replace(tmp, os.path.join(state_path, "hwm.json"))

    writer = df.writeStream.foreachBatch(process).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer, records
