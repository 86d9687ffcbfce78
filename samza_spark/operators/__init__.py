"""High-level streams DSL — Samza's MessageStream operators on DataFrames.

See /root/reference samza-api/src/main/java/org/apache/samza/operators/
MessageStream.java:50 for the reference surface; SURVEY.md §2.1 maps each
operator to its Spark primitive.
"""

from samza_spark.operators.stream import MessageStream, KV
from samza_spark.operators.windows import (
    Windows,
    WindowSpec,
    Triggers,
    Trigger,
    AccumulationMode,
)

__all__ = [
    "MessageStream",
    "KV",
    "Windows",
    "WindowSpec",
    "Triggers",
    "Trigger",
    "AccumulationMode",
]
