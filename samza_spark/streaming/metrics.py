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


# ---------------------------------------------------------------------------
# MetricsSnapshot stream reporter (MetricsSnapshotReporter parity)
# ---------------------------------------------------------------------------

SAMZA_SPARK_VERSION = "0.6.0"
SNAPSHOT_SCHEMA_VERSION = "0.0.1"  # MetricsHeader "version" field


def metrics_snapshot(
    query=None,
    *,
    job_name: str,
    job_id: str = "1",
    container_name: str = "samza-container-0",
    source: "str | None" = None,
    exec_env_container_id: str = "",
    host: "str | None" = None,
    reset_time_ms: int = 0,
    time_ms: "int | None" = None,
    extra_groups: "dict | None" = None,
    blacklist: "str | None" = None,
) -> dict:
    """Build one MetricsSnapshot in the reference's wire layout.

    Reference parity: the reference periodically serializes a
    ``MetricsSnapshot`` — a header identifying the job/container plus a
    ``group -> metric -> value`` map — and sends it to a metrics stream
    (samza-core/.../metrics/reporter/MetricsSnapshot.java,
    MetricsHeader.java:28-38 for the exact header keys,
    MetricsSnapshotReporter.java for the send loop; the JSON layout is
    MetricsSnapshotSerdeV2). Here the body is distilled from the Spark
    StreamingQuery's own progress telemetry (:func:`progress_summary`):
    ``process-envelopes`` is the container-metrics name the reference
    uses for rows processed (SamzaContainerMetrics.scala).

    ``blacklist`` is the reporter's metric-name exclusion regex
    (MetricsConfig.java:46 ``metrics.reporter.%s.blacklist``), applied to
    ``group#name`` just like TestMetricsSnapshotReporter exercises it.
    """
    import re
    import socket
    import time as _time

    body = progress_summary(query) if query is not None else {}
    groups: dict = {}
    if body:
        groups["org.apache.samza.container.SamzaContainerMetrics"] = {
            "process-envelopes": body["input_rows"],
            "commit-calls": body["batches"],
        }
        groups["samza_spark.streaming.StreamingQueryMetrics"] = dict(body)
    for g, ms in (extra_groups or {}).items():
        groups.setdefault(g, {}).update(ms)
    if blacklist:
        pat = re.compile(blacklist)
        groups = {
            g: {n: v for n, v in ms.items() if not pat.search(f"{g}#{n}")}
            for g, ms in groups.items()
        }
        groups = {g: ms for g, ms in groups.items() if ms}
    return {
        "header": {
            "job-name": job_name,
            "job-id": job_id,
            "container-name": container_name,
            "exec-env-container-id": exec_env_container_id,
            "source": source or container_name,
            "version": SNAPSHOT_SCHEMA_VERSION,
            "samza-version": SAMZA_SPARK_VERSION,
            "host": host if host is not None else socket.gethostname(),
            "time": int(_time.time() * 1000) if time_ms is None else int(time_ms),
            "reset-time": int(reset_time_ms),
        },
        "metrics": groups,
    }


class MetricsSnapshotReporter:
    """Append MetricsSnapshots to a metrics stream directory as JSON
    files — the MetricsSnapshotReporter/SystemProducer analog
    (samza-core/.../metrics/reporter/MetricsSnapshotReporter.java:
    its run() drains registered registries into snapshots and sends each
    to the configured ``metrics.reporter.<name>.stream``).

    Spark-native differences: progress telemetry is *pulled* from the
    query handle (no background thread — call :meth:`report` per trigger
    or after a drain), and the stream is a directory of one-JSON-object
    files so ``spark.read.json(dir)`` consumes it like any other stream.
    Each snapshot lands in its own file (atomic at the filesystem level,
    ordered by zero-padded sequence) — the same append-only contract as
    a log-compacted metrics topic.
    """

    def __init__(
        self,
        stream_path: str,
        *,
        job_name: str,
        job_id: str = "1",
        container_name: str = "samza-container-0",
        blacklist: "str | None" = None,
        reset_time_ms: "int | None" = None,
    ) -> None:
        import os
        import time as _time

        self.stream_path = stream_path
        self.job_name = job_name
        self.job_id = job_id
        self.container_name = container_name
        self.blacklist = blacklist
        self.reset_time_ms = (
            int(_time.time() * 1000) if reset_time_ms is None else reset_time_ms
        )
        self._seq = 0
        os.makedirs(stream_path, exist_ok=True)

    def report(self, query=None, extra_groups: "dict | None" = None,
               time_ms: "int | None" = None) -> dict:
        """Build one snapshot and append it to the stream. Returns it."""
        import json
        import os

        snap = metrics_snapshot(
            query,
            job_name=self.job_name,
            job_id=self.job_id,
            container_name=self.container_name,
            reset_time_ms=self.reset_time_ms,
            time_ms=time_ms,
            extra_groups=extra_groups,
            blacklist=self.blacklist,
        )
        path = os.path.join(self.stream_path, f"snapshot-{self._seq:06d}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps(snap, sort_keys=True))
        os.replace(tmp, path)
        self._seq += 1
        return snap
