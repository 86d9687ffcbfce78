"""Per-key token-bucket admission control (stream + exact batch replay).

The reference rate-limits TABLE IO (samza-api
``util.RateLimiter`` / ``table.retry.TableRateLimiter`` — credits per
key, acquire-before-access) and leans on back-pressure for streams; the
stream-side analog every ingestion/API-call pipeline needs is per-key
admission: a token bucket (rate r tokens/s, burst b) replayed in EVENT
time, marking each record admitted or throttled. Event-time replay
makes the operator deterministic — the same input always yields the
same admit/deny sequence, which is what lets the streaming path be
tested against an exact batch replay (same kernel, one pass per key).

State is two integers per key (milli-tokens, last event-time µs) — the
applyInPandasWithState layout; the batch replay is one ``applyInPandas``
scan per key after a per-key sort. Arithmetic is integer milli-tokens
(``refill = dt_us * rate_milli_per_sec div 1e6``), so there is no float
drift between the stream and batch paths.

Scale: one shuffle on the key in both paths; per-key state is O(1).
The per-key sequential scan is inherent to the recurrence (token count
is a non-associative running min) — the same reason Samza runs a
per-SSP RunLoop.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _replay(
    ts_us: "list[int]",
    rate_milli_per_sec: int,
    burst_milli: int,
    tokens_milli: int,
    last_us: "int | None",
):
    """Token-bucket recurrence over one ordered ts run. Returns
    (admitted flags, post-row token balances, final tokens, final last)."""
    admitted, balances = [], []
    for t in ts_us:
        if last_us is not None and t > last_us:
            tokens_milli = min(
                burst_milli,
                tokens_milli
                + (t - last_us) * rate_milli_per_sec // 1_000_000,
            )
        last_us = t
        if tokens_milli >= 1000:
            tokens_milli -= 1000
            admitted.append(1)
        else:
            admitted.append(0)
        balances.append(tokens_milli)
    return admitted, balances, tokens_milli, last_us


def _out_ddl(key_ddl: str) -> str:
    return (
        f"{key_ddl}, seq long, ts_us long, tokens_milli long, admitted int"
    )


def rate_limit_batch(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str,
    rate_milli_per_sec: int = 1000,
    burst_milli: int = 5000,
) -> DataFrame:
    """Exact batch replay: per key, sort by (event-time µs, seq) and run
    the bucket once. ``seq_col`` breaks event-time ties so the replay is
    a total order (the determinism contract). Returns ``(key, seq,
    ts_us, tokens_milli, admitted)``."""
    key_field = [f for f in df.schema.fields if f.name == key_col][0]
    key_ddl = f"{key_col} {key_field.dataType.simpleString()}"

    base = df.select(
        F.col(key_col),
        F.col(seq_col).cast("long").alias("seq"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "seq"], kind="mergesort")
        adm, bal, _, _ = _replay(
            pdf["ts_us"].tolist(),
            rate_milli_per_sec,
            burst_milli,
            burst_milli,
            None,
        )
        pdf = pdf.assign(tokens_milli=bal, admitted=adm)
        return pdf[[key_col, "seq", "ts_us", "tokens_milli", "admitted"]]

    return base.groupBy(key_col).applyInPandas(run, _out_ddl(key_ddl))


def rate_limit_stream(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str,
    rate_milli_per_sec: int = 1000,
    burst_milli: int = 5000,
) -> DataFrame:
    """Streaming token bucket with per-key carried state. Chunks are
    replayed in (ts, seq) order WITHIN each micro-batch; as long as
    batches arrive in event-time order per key (a sorted replay, or an
    upstream watermark sort), the admit/deny sequence is byte-identical
    to :func:`rate_limit_batch` — tested streamed==batch."""
    key_field = [f for f in df.schema.fields if f.name == key_col][0]
    key_ddl = f"{key_col} {key_field.dataType.simpleString()}"

    base = df.select(
        F.col(key_col),
        F.col(seq_col).cast("long").alias("seq"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
    )

    def fn(
        key, pdf_iter: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            tokens_milli, last_us = state.get
        else:
            tokens_milli, last_us = burst_milli, None
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts_us", "seq"], kind="mergesort")
            adm, bal, tokens_milli, last_us = _replay(
                pdf["ts_us"].tolist(),
                rate_milli_per_sec,
                burst_milli,
                tokens_milli,
                last_us,
            )
            out = pdf.assign(tokens_milli=bal, admitted=adm)
            yield out[[key_col, "seq", "ts_us", "tokens_milli", "admitted"]]
        state.update((int(tokens_milli), int(last_us or 0)))

    return base.groupBy(F.col(key_col)).applyInPandasWithState(
        fn,
        _out_ddl(key_ddl),
        "tokens_milli long, last_us long",
        "append",
        GroupStateTimeout.NoTimeout,
    )
