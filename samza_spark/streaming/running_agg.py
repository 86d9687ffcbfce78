"""Per-key running aggregates on the modern stateful API
(``transformWithStateInPandas``, Spark 4).

Samza analog: a task accumulating per-key totals in its KeyValueStore
(KeyValueStore.java:40 get/put) and emitting the updated value per message
— the canonical low-level stateful pattern (e.g. the reference's join/
checker correctness job). Here the state lives in Spark's state store via
a StatefulProcessor ValueState; output is one row per (key, batch) with
the running count/sum after that batch.

This module is also the engine's proving ground for the
StatefulProcessor API (vs. the applyInPandasWithState path used by
triggered windows — see NOTES.md for that API's timeout caveats).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)


class _RunningAgg(StatefulProcessor):
    def __init__(self, value_col: str | None):
        self.value_col = value_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getValueState("acc", "n bigint, total double")

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        n, total = 0, 0.0
        if self.state.exists():
            n, total = self.state.get()
        for pdf in rows:
            n += len(pdf)
            if self.value_col is not None:
                total += float(pdf[self.value_col].sum())
        self.state.update((n, total))
        yield pd.DataFrame(
            {"key": [key[0]], "running_n": [n], "running_total": [total]}
        )

    def close(self) -> None:
        pass


def running_aggregate(
    stream,
    key_col: str,
    value_col: str | None = None,
) -> DataFrame:
    """Running per-key (count, sum) emitted after every micro-batch that
    touches the key. State persists across batches in the state store."""
    try:  # the TWS state protocol needs protobuf, absent from this image
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas requires the google.protobuf package "
            "(its state-server protocol is protobuf-encoded), which is not "
            "installed in this environment — use the applyInPandasWithState "
            "operators in samza_spark.streaming.stateful instead"
        ) from exc
    df = getattr(stream, "df", stream)
    return (
        df.groupBy(F.col(key_col))
        .transformWithStateInPandas(
            _RunningAgg(value_col),
            outputStructType="key string, running_n bigint, running_total double",
            outputMode="append",
            timeMode="none",
        )
    )
