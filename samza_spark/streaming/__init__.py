"""Stateful streaming extensions: trigger/accumulation-mode windows,
TTL stream-stream joins, and bounded-state heavy hitters
(SURVEY.md §2.1-2.2, §4.2)."""

from samza_spark.streaming.stateful import triggered_window, AggSpec
from samza_spark.streaming.topk import streaming_top_k, top_k_exact_batch

__all__ = ["triggered_window", "AggSpec", "streaming_top_k", "top_k_exact_batch"]
