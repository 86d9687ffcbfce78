"""Streaming job observability — the engine-side metrics surface.

The reference exposes per-container metrics (SamzaContainerMetrics,
TaskInstanceMetrics: process-envelopes, window/commit timings, KV-store
counters) through its MetricsRegistry. Spark publishes the same
telemetry on every StreamingQuery progress object; this module distills
it into the handful of numbers an operator actually watches, without
any listener plumbing (progress objects are pulled, not pushed, so this
works after the fact and in tests).

``progress_summary(query)`` -> dict with:

- ``batches``: micro-batches observed (bounded by Spark's progress
  retention, spark.sql.streaming.numRecentProgressUpdates)
- ``input_rows``: total rows ingested across those batches
- ``rows_per_sec``: input_rows / sum of batch durations
- ``avg_batch_ms`` / ``max_batch_ms``: trigger latency profile
- ``state_rows``: total keys across stateful operators (last batch)
- ``state_bytes``: state-store memory used (last batch)
- ``watermark``: the last event-time watermark, if any
- ``dropped_late_rows``: rows dropped by watermark across batches —
  the late-data audit every event-time pipeline needs
"""

from __future__ import annotations


def progress_summary(query) -> dict:
    """Summarize a StreamingQuery's recent progress (see module doc)."""
    progresses = [p for p in (query.recentProgress or []) if p]
    out = {
        "batches": 0,
        "input_rows": 0,
        "rows_per_sec": 0.0,
        "avg_batch_ms": 0.0,
        "max_batch_ms": 0,
        "state_rows": 0,
        "state_bytes": 0,
        "watermark": None,
        "dropped_late_rows": 0,
    }
    if not progresses:
        return out
    total_ms = 0
    for p in progresses:
        out["batches"] += 1
        out["input_rows"] += int(p.get("numInputRows", 0) or 0)
        ms = int((p.get("durationMs") or {}).get("triggerExecution", 0) or 0)
        total_ms += ms
        out["max_batch_ms"] = max(out["max_batch_ms"], ms)
        for so in p.get("stateOperators") or []:
            out["dropped_late_rows"] += int(
                so.get("numRowsDroppedByWatermark", 0) or 0
            )
    last = progresses[-1]
    for so in last.get("stateOperators") or []:
        out["state_rows"] += int(so.get("numRowsTotal", 0) or 0)
        out["state_bytes"] += int(so.get("memoryUsedBytes", 0) or 0)
    wm = (last.get("eventTime") or {}).get("watermark")
    out["watermark"] = wm
    if total_ms > 0:
        out["avg_batch_ms"] = round(total_ms / out["batches"], 1)
        out["rows_per_sec"] = round(out["input_rows"] * 1000.0 / total_ms, 1)
    return out
