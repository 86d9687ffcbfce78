"""Stateful streaming extensions: trigger/accumulation-mode windows and
TTL stream-stream joins (SURVEY.md §2.1-2.2, §4.2)."""

from samza_spark.streaming.stateful import triggered_window, AggSpec

__all__ = ["triggered_window", "AggSpec"]
