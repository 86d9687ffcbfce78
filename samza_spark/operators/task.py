"""Low-level Task API analog (Samza layer 1).

Reference: ``StreamTask.process(envelope, collector, coordinator)``
(/root/reference samza-api/.../task/StreamTask.java:38),
``WindowableTask.window(collector, coordinator)`` (task/WindowableTask.java:28),
``TaskCoordinator`` shutdown/commit (task/TaskCoordinator.java).

Spark mapping (SURVEY.md §0): the per-message callback becomes a
per-micro-batch callback over a DataFrame (the envelope set), driven by
``foreachBatch``; ``window()`` fires between batches when its processing-time
interval has elapsed — the same RunLoop-interleaved, mutually-exclusive
process/window contract (RunLoop.java:201), at micro-batch granularity.
State that Samza would keep in a task-local store belongs in the task
object itself (driver-side; small) or in a samza_spark table.

This is the escape hatch for imperative logic; everything expressible as
DataFrame ops should use the DSL instead (it stays in Catalyst).
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame


class Collector:
    """MessageCollector analog: buffers rows (as Row/tuple/dict) that the
    runner flushes to the output sink after each callback."""

    def __init__(self):
        self._out: list = []

    def send(self, row) -> None:
        self._out.append(row)

    def drain(self) -> list:
        out, self._out = self._out, []
        return out


class Coordinator:
    """TaskCoordinator analog: request shutdown from inside a callback."""

    def __init__(self):
        self.shutdown_requested = False

    def shutdown(self) -> None:
        self.shutdown_requested = True


class StreamTaskRunner:
    """Drive a process/window callback pair over a streaming DataFrame.

    ``process(batch_df, collector, coordinator)`` is called once per
    micro-batch; ``window(collector, coordinator)`` (optional) is called
    between batches once ``window_interval_s`` has elapsed since its last
    firing (WindowableTask semantics under micro-batching). Collected rows
    are appended to ``output_sink`` (any descriptor with ``write``) as a
    batch DataFrame with ``output_schema``.
    """

    def __init__(
        self,
        process: Callable,
        window: Callable | None = None,
        window_interval_s: float = 10.0,
        output_sink=None,
        output_schema: str | None = None,
    ):
        self.process = process
        self.window = window
        self.window_interval_s = window_interval_s
        self.output_sink = output_sink
        self.output_schema = output_schema
        self._last_window = time.monotonic()
        self._query = None

    def _flush(self, spark, collector: Collector) -> None:
        rows = collector.drain()
        if not rows or self.output_sink is None:
            return
        out_df = spark.createDataFrame(rows, self.output_schema)
        self.output_sink.write(out_df)

    def run(self, stream) -> object:
        """Start the task over a MessageStream/streaming DataFrame; returns
        the StreamingQuery."""
        df = getattr(stream, "df", stream)
        collector = Collector()
        coordinator = Coordinator()
        # the outer session: foreachBatch hands us a cloned session whose
        # temp views are invisible to the caller, so sinks must write
        # through the session the user holds
        outer_spark = df.sparkSession

        def on_batch(batch_df: DataFrame, _epoch: int) -> None:
            spark = outer_spark
            self.process(batch_df, collector, coordinator)
            now = time.monotonic()
            if (
                self.window is not None
                and now - self._last_window >= self.window_interval_s
            ):
                self._last_window = now
                self.window(collector, coordinator)
            self._flush(spark, collector)
            if coordinator.shutdown_requested and self._query is not None:
                # graceful stop after the current batch commits (the
                # TaskCoordinator.shutdown(NOW) analog)
                import threading

                threading.Thread(target=self._query.stop, daemon=True).start()

        self._query = df.writeStream.foreachBatch(on_batch).start()
        return self._query
