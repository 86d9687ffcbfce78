"""Triggered windows with accumulation modes — the custom stateful operator.

Samza semantics being reproduced (/root/reference):

* early triggers fire panes before window close: count(n),
  timeSinceFirstMessage(d), timeSinceLastMessage(d), any(...), repeat(...)
  — samza-api/.../operators/triggers/Triggers.java:54-106, evaluated in
  samza-core/.../operators/impl/WindowOperatorImpl.java:253-297.
* AccumulationMode.DISCARDING purges pane state on every fire;
  ACCUMULATING keeps it (WindowOperatorImpl.java:272,
  windows/AccumulationMode.java).
* windows are assigned by event time but triggered on processing time
  (a Clock is injected — WindowOperatorImpl.java:104-113).

Catalyst has no per-pane trigger analog (SURVEY.md §4.2 item 1), so this is
implemented with ``applyInPandasWithState`` for streams and an
``applyInPandas`` emulation for batch/replay. State per key is a dict of
open windows, exactly Samza's TimeSeriesStore layout ``(key, windowStart)``
(samza-core/.../operators/impl/store/TimeSeriesStoreImpl.java:79).

Scale note: state is partitioned by key across executors (RocksDB state
store provider), and each Arrow batch is aggregated vectorised in pandas —
no per-row Python in the hot path. Pane output is append-mode, so the sink
sees the same pane stream Samza's downstream operators see.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from samza_spark.operators.windows import (
    AccumulationMode,
    Trigger,
    WindowSpec,
    WindowType,
)

_AGG_OPS = {"count", "sum", "min", "max", "avg"}


@dataclass(frozen=True)
class AggSpec:
    """A pane aggregation: op in count|sum|min|max|avg over ``col``
    (the FoldLeftFunction analog, Windows.java:128-221; Samza's SQL layer
    only ever folds COUNT — LogicalAggregateTranslator.java:62-87)."""

    name: str
    op: str
    col: str | None = None

    def __post_init__(self):
        if self.op not in _AGG_OPS:
            raise ValueError(f"unsupported pane agg: {self.op}")


def _duration_ms(text: str) -> int:
    qty, unit = text.split()
    unit = unit.rstrip("s")
    scale = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }[unit]
    return int(float(qty) * scale)


def _flatten_triggers(t: Trigger | None) -> list[Trigger]:
    if t is None:
        return []
    if t.kind in ("any", "repeat"):
        out: list[Trigger] = []
        for c in t.children:
            out.extend(_flatten_triggers(c))
        return out
    return [t]


def _pane_agg(pdf: pd.DataFrame, aggs: Sequence[AggSpec]) -> dict:
    """Vectorised partial aggregation of one Arrow chunk of a pane."""
    out = {}
    for a in aggs:
        if a.op == "count":
            out[a.name] = (len(pdf), None)
        elif a.op == "sum":
            out[a.name] = (float(pdf[a.col].sum()), None)
        elif a.op == "min":
            out[a.name] = (float(pdf[a.col].min()), None)
        elif a.op == "max":
            out[a.name] = (float(pdf[a.col].max()), None)
        elif a.op == "avg":
            out[a.name] = (float(pdf[a.col].sum()), len(pdf))
    return out


def _merge_partial(state: dict, partial: dict, aggs: Sequence[AggSpec]) -> None:
    for a in aggs:
        new_v, new_n = partial[a.name]
        if a.name not in state:
            state[a.name] = [new_v, new_n]
            continue
        cur = state[a.name]
        if a.op in ("count", "sum"):
            cur[0] += new_v
        elif a.op == "min":
            cur[0] = min(cur[0], new_v)
        elif a.op == "max":
            cur[0] = max(cur[0], new_v)
        elif a.op == "avg":
            cur[0] += new_v
            cur[1] += new_n


def _merge_states(a: dict, b: dict, aggs: Sequence[AggSpec]) -> dict:
    """Merge two pane states (both {name: [value, n]}) — used when session
    windows coalesce. All supported aggs are commutative merges."""
    out = {k: list(v) for k, v in a.items()}
    for ag in aggs:
        if ag.name not in b:
            continue
        bv, bn = b[ag.name]
        if ag.name not in out:
            out[ag.name] = [bv, bn]
            continue
        cur = out[ag.name]
        if ag.op in ("count", "sum"):
            cur[0] += bv
        elif ag.op == "min":
            cur[0] = min(cur[0], bv)
        elif ag.op == "max":
            cur[0] = max(cur[0], bv)
        elif ag.op == "avg":
            cur[0] += bv
            cur[1] += bn
    return out


def _finalize(state: dict, aggs: Sequence[AggSpec]) -> dict:
    out = {}
    for a in aggs:
        v, n = state[a.name]
        if a.op == "count":
            out[a.name] = int(v)
        elif a.op == "avg":
            out[a.name] = v / n if n else None
        else:
            out[a.name] = v
    return out


def output_schema_ddl(spec: WindowSpec, key_ddl: str, aggs: Sequence[AggSpec]) -> str:
    agg_ddl = ", ".join(
        f"{a.name} {'bigint' if a.op == 'count' else 'double'}" for a in aggs
    )
    prefix = f"{key_ddl}, " if key_ddl else ""
    return (
        f"{prefix}window_start timestamp, window_end timestamp, "
        f"{agg_ddl}, pane_seq int, fire_reason string, is_final boolean"
    )


# ---------------------------------------------------------------------------
# Batch emulation (replay): deterministic pane stream given event-time order.
# ---------------------------------------------------------------------------


def triggered_window_batch(
    df: DataFrame,
    spec: WindowSpec,
    aggs: Sequence[AggSpec],
) -> DataFrame:
    """Replay-mode pane computation: what the trigger machinery *would* emit
    given rows in event-time order. Used for BATCH ApplicationMode parity
    (ApplicationConfig.java:44-46) and as the deterministic oracle for the
    streaming operator's tests."""
    win_ms = _duration_ms(spec.duration) if spec.duration else None
    gap_ms = _duration_ms(spec.gap) if spec.gap else None
    triggers = _flatten_triggers(spec.early_trigger)
    count_ns = [t.count for t in triggers if t.kind == "count"]
    discarding = spec.accumulation is AccumulationMode.DISCARDING
    key_cols = list(spec.key_cols)
    ts_col = spec.ts_col
    key_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in key_cols
    )
    out_ddl = output_schema_ddl(spec, key_ddl, aggs)

    def emit_panes(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        ts_ms = (pdf[ts_col].astype("int64") // 1_000_000).to_numpy()
        if spec.window_type is WindowType.SESSION:
            bounds = []
            start = prev = None
            for t in ts_ms:
                if start is None:
                    start = prev = t
                elif t - prev > gap_ms:
                    bounds.append((start, prev + gap_ms))
                    start = prev = t
                else:
                    prev = t
            if start is not None:
                bounds.append((start, prev + gap_ms))

            def window_of(t):
                for s, e in bounds:
                    if s <= t < e:
                        return (s, e)
                return (bounds[-1][0], bounds[-1][1])

            win_starts = [window_of(t) for t in ts_ms]
        else:
            win_starts = [((t // win_ms) * win_ms, (t // win_ms) * win_ms + win_ms) for t in ts_ms]

        rows = []
        open_windows: dict = {}
        order: list = []
        for i, (ws, we) in enumerate(win_starts):
            wkey = (ws, we)
            st = open_windows.setdefault(wkey, {"state": {}, "n_since_fire": 0, "seq": 0})
            if wkey not in order:
                order.append(wkey)
            chunk = pdf.iloc[i : i + 1]
            _merge_partial(st["state"], _pane_agg(chunk, aggs), aggs)
            st["n_since_fire"] += 1
            fire_n = next((n for n in count_ns if st["n_since_fire"] >= n), None)
            if fire_n is not None:
                vals = _finalize(st["state"], aggs)
                rows.append((wkey, vals, st["seq"], f"count({fire_n})", False))
                st["seq"] += 1
                st["n_since_fire"] = 0
                if discarding:
                    st["state"] = {}
        for wkey in order:
            st = open_windows[wkey]
            if st["state"]:
                vals = _finalize(st["state"], aggs)
                rows.append((wkey, vals, st["seq"], "window_close", True))

        key_vals = {k: pdf[k].iloc[0] for k in key_cols}
        recs = []
        for (ws, we), vals, seq, reason, final in rows:
            rec = dict(key_vals)
            rec["window_start"] = pd.Timestamp(ws, unit="ms")
            rec["window_end"] = pd.Timestamp(we, unit="ms")
            rec.update(vals)
            rec["pane_seq"] = seq
            rec["fire_reason"] = reason
            rec["is_final"] = final
            recs.append(rec)
        cols = (
            key_cols
            + ["window_start", "window_end"]
            + [a.name for a in aggs]
            + ["pane_seq", "fire_reason", "is_final"]
        )
        return pd.DataFrame(recs, columns=cols)

    grouped = df.groupBy(*[F.col(k) for k in key_cols]) if key_cols else df.groupBy(F.lit(1).alias("__g"))
    out = grouped.applyInPandas(lambda pdf: emit_panes(pdf), out_ddl)
    return out


# ---------------------------------------------------------------------------
# Streaming operator: applyInPandasWithState.
# ---------------------------------------------------------------------------


def triggered_window_stream(
    df: DataFrame,
    spec: WindowSpec,
    aggs: Sequence[AggSpec],
) -> DataFrame:
    """Streaming pane computation with per-key state.

    State layout: one dict per open window keyed by window_start —
    Samza's TimeSeriesStore ``(key, windowStart)`` composite key
    (TimeSeriesStoreImpl.java:79) carried in Spark's state store.
    Time-based triggers use ProcessingTimeTimeout, matching Samza's
    injected-Clock processing-time trigger evaluation.

    SESSION windows keep dynamic ``(start, last_event+gap)`` state keys;
    incoming chunks are split at >gap breaks and coalesced with every
    overlapping open session (Samza's session merge), and the gap timer
    closes a session one gap after its last event.

    Granularity note: Samza evaluates count triggers per *message*
    (RunLoop drives one envelope at a time); under micro-batching the
    trigger condition is checked per Arrow chunk, so a count(3) pane may
    carry more than 3 rows when a chunk overshoots the threshold. The batch
    replay (`triggered_window_batch`) keeps exact per-message semantics and
    is the reference for tests/oracles."""
    import json
    import time as _time

    is_session = spec.window_type is WindowType.SESSION
    win_ms = _duration_ms(spec.duration) if spec.duration else None
    gap_ms = _duration_ms(spec.gap) if spec.gap else None
    triggers = _flatten_triggers(spec.early_trigger)
    count_ns = [t.count for t in triggers if t.kind == "count"]
    since_first = [
        _duration_ms(t.duration) for t in triggers if t.kind == "time_since_first"
    ]
    since_last = [
        _duration_ms(t.duration) for t in triggers if t.kind == "time_since_last"
    ]
    discarding = spec.accumulation is AccumulationMode.DISCARDING
    key_cols = list(spec.key_cols)
    ts_col = spec.ts_col
    close_after_ms = win_ms or gap_ms or 60_000

    key_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in key_cols
    )
    out_ddl = output_schema_ddl(spec, key_ddl, aggs)
    state_ddl = "payload string"

    def fn(key, pdf_iter: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            windows = json.loads(state.get[0])
        else:
            windows = {}
        now_ms = int(_time.time() * 1000)
        out_rows = []

        def fire(wkey: str, st: dict, reason: str, final: bool) -> None:
            vals = _finalize({k: list(v) for k, v in st["state"].items()}, aggs)
            rec = {k: v for k, v in zip(key_cols, key)}
            ws, we = map(int, wkey.split(":"))
            rec["window_start"] = pd.Timestamp(ws, unit="ms")
            rec["window_end"] = pd.Timestamp(we, unit="ms")
            rec.update(vals)
            rec["pane_seq"] = st["seq"]
            rec["fire_reason"] = reason
            rec["is_final"] = final
            out_rows.append(rec)
            st["seq"] += 1
            st["n_since_fire"] = 0
            if discarding:
                st["state"] = {}

        def fresh_st():
            return {
                "state": {},
                "n_since_fire": 0,
                "seq": 0,
                "first_ms": now_ms,
                "last_ms": now_ms,
                "quiet_fired": False,
            }

        def ingest(wkey: str, chunk: pd.DataFrame) -> None:
            st = windows.setdefault(wkey, fresh_st())
            st["quiet_fired"] = False  # new data re-arms time triggers
            partial = _pane_agg(chunk, aggs)
            merged = {k: list(v) for k, v in st["state"].items()}
            _merge_partial(merged, partial, aggs)
            st["state"] = merged
            st["n_since_fire"] += len(chunk)
            st["last_ms"] = now_ms
            fire_n = next((n for n in count_ns if st["n_since_fire"] >= n), None)
            if fire_n is not None:
                fire(wkey, st, f"count({fire_n})", False)

        def ingest_session(chunk: pd.DataFrame, ts_ms) -> None:
            """Sessions: split the (sorted) chunk at >gap breaks, then merge
            each mini-session with every overlapping open session — Samza's
            session coalescing (WindowOperatorImpl session merge) carried in
            the state store as dynamic (start, end) keys."""
            order = ts_ms.argsort(kind="mergesort")
            sorted_ts = ts_ms[order]
            breaks = [0]
            for i in range(1, len(sorted_ts)):
                if sorted_ts[i] - sorted_ts[i - 1] > gap_ms:
                    breaks.append(i)
            breaks.append(len(sorted_ts))
            for b0, b1 in zip(breaks, breaks[1:]):
                idx = order[b0:b1]
                mini = chunk.iloc[idx]
                s, e = int(sorted_ts[b0]), int(sorted_ts[b1 - 1]) + gap_ms
                overlapping = []
                for wkey in list(windows):
                    ws, we = map(int, wkey.split(":"))
                    if s <= we and ws <= e:
                        overlapping.append((wkey, ws, we))
                new_ws = min([s] + [ws for _, ws, _ in overlapping])
                new_we = max([e] + [we for _, _, we in overlapping])
                merged_st = fresh_st()
                for wkey, _, _ in overlapping:
                    old = windows.pop(wkey)
                    merged_st["state"] = _merge_states(merged_st["state"], old["state"], aggs)
                    merged_st["n_since_fire"] += old["n_since_fire"]
                    merged_st["seq"] = max(merged_st["seq"], old["seq"])
                    merged_st["first_ms"] = min(merged_st["first_ms"], old["first_ms"])
                windows[f"{new_ws}:{new_we}"] = merged_st
                ingest(f"{new_ws}:{new_we}", mini)

        got_data = False
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            got_data = True
            ts_ms = (pdf[ts_col].astype("int64") // 1_000_000).to_numpy()
            if is_session:
                ingest_session(pdf, ts_ms)
                continue
            for ws_val, chunk in pdf.groupby((ts_ms // win_ms) * win_ms if win_ms else 0):
                ws = int(ws_val)
                we = ws + (win_ms or gap_ms)
                ingest(f"{ws}:{we}", chunk)

        # Close/time-trigger sweep runs on EVERY invocation, not only on
        # timeout: each data batch resets the timeout clock, so under
        # sustained per-key traffic a timeout-only sweep would never fire
        # window_close and expired windows would pile up in state forever.
        # Windows touched this batch have last_ms == now_ms, so fresh
        # sessions never close early and last_due never fires spuriously.
        for wkey in list(windows):
            st = windows[wkey]
            first_due = any(now_ms - st["first_ms"] >= d for d in since_first)
            last_due = any(now_ms - st["last_ms"] >= d for d in since_last)
            # sessions close one gap after the LAST event (arrival-clock
            # proxy for the gap timer); fixed windows after their span
            closing = (
                now_ms - st["last_ms"] >= gap_ms
                if is_session
                else now_ms - st["first_ms"] >= close_after_ms
            )
            if closing:
                if st["state"]:
                    fire(wkey, st, "window_close", True)
                del windows[wkey]
            elif (
                (first_due or last_due)
                and st["state"]
                and not st.get("quiet_fired")
            ):
                # one fire per quiet period (Samza re-evaluates
                # timeSinceLastMessage only as messages arrive; repeat
                # semantics need Triggers.repeat)
                fire(wkey, st, "time_trigger", False)
                st["quiet_fired"] = True

        if windows:
            state.update((json.dumps(windows),))
            next_due = min(
                [close_after_ms]
                + [d for d in since_first]
                + [d for d in since_last]
            )
            state.setTimeoutDuration(int(next_due))
        elif state.exists:
            state.remove()

        cols = (
            key_cols
            + ["window_start", "window_end"]
            + [a.name for a in aggs]
            + ["pane_seq", "fire_reason", "is_final"]
        )
        yield pd.DataFrame(out_rows, columns=cols)

    return (
        df.groupBy(*[F.col(k) for k in key_cols])
        .applyInPandasWithState(
            fn, out_ddl, state_ddl, "append", GroupStateTimeout.ProcessingTimeTimeout
        )
    )


def await_condition(query, condition, timeout_s: float = 60.0, poll_s: float = 0.25) -> bool:
    """Wait until ``condition()`` is truthy or ``timeout_s`` elapses.

    Required instead of ``StreamingQuery.processAllAvailable`` for queries
    containing this operator: with ``ProcessingTimeTimeout`` configured,
    Spark's FlatMapGroupsWithStateExec.shouldRunAnotherBatch is always true
    (timer-evaluation batches are scheduled indefinitely), so the engine
    never signals ``noNewData`` and processAllAvailable blocks forever.
    Returns True if the condition was met; raises if the query failed."""
    import time as _time

    deadline = _time.monotonic() + timeout_s
    while _time.monotonic() < deadline:
        if query.exception() is not None:
            raise query.exception()
        if condition():
            return True
        _time.sleep(poll_s)
    return bool(condition())


def triggered_window(df: DataFrame, spec: WindowSpec, agg_cols) -> DataFrame:
    """Entry point used by MessageStream.window for trigger/DISCARDING specs.

    ``agg_cols`` may be AggSpec objects; Column aggregates are not accepted
    on the stateful path (Samza's trigger path only folds —
    WindowOperatorImpl's FoldLeftFunctions).
    """
    aggs = [a for a in agg_cols if isinstance(a, AggSpec)]
    if not aggs:
        aggs = [AggSpec("count", "count")]
    if df.isStreaming:
        return triggered_window_stream(df, spec, aggs)
    return triggered_window_batch(df, spec, aggs)
