"""Session-closed transcript assembly on native session windows.

Reference shape: Samza's keyed session windows emit the accumulated
session when the gap expires (WindowInternal SESSION + ScheduledFunction
sweep — operators/windows.py implements the triggered-pane form); a
chat/dialogue pipeline uses exactly that to ship COMPLETED conversation
transcripts downstream.

Spark-first: ``groupBy(user, session_window(ts, gap))`` in append mode
IS that operator — the engine buffers per-session state and emits once
the watermark passes the session end, no custom state code. The turn
structure is computed from the sorted in-session event list with array
expressions (session-bounded, never corpus-sized), mirroring
:func:`samza_spark.pipeline.events.dialogue_turns` so stream == batch is
testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dialogue_sessions_stream(
    df: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    role_of: "dict[str, str] | None" = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Completed-dialogue emission: one row per closed session with the
    same turn statistics as the batch ``dialogue_turns`` operator
    (n_events, n_turns, first/last role, strict alternation) plus the
    session window bounds. Append-mode semantics: a session row is
    emitted exactly once, when the watermark passes its close — the
    at-session-end delivery contract of the reference's session windows.
    """
    role_of = role_of or {"view": "user", "click": "user"}
    mapping = F.create_map(*[F.lit(x) for kv in role_of.items() for x in kv])
    d = df.withWatermark(ts_col, watermark).withColumn(
        "__role", F.coalesce(mapping[F.col(type_col)], F.lit("assistant"))
    )
    evs = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(id_col).alias("id"),
                F.col("__role").alias("role"),
            )
        )
    )
    agged = d.groupBy(
        F.col(user_col), F.session_window(F.col(ts_col), gap)
    ).agg(evs.alias("__evs"))
    turns = F.expr(
        "CASE WHEN size(__evs) <= 1 THEN size(__evs) ELSE "
        "size(filter(transform(sequence(1, size(__evs) - 1), "
        "i -> __evs[i].role != __evs[i - 1].role), x -> x)) + 1 END"
    )
    return agged.select(
        user_col,
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        F.size("__evs").alias("n_events"),
        turns.cast("long").alias("n_turns"),
        F.element_at("__evs", 1)["role"].alias("first_role"),
        F.element_at("__evs", -1)["role"].alias("last_role"),
        (F.element_at("__evs", 1)["role"] == F.lit("user")).alias("starts_user"),
        (turns == F.size("__evs")).alias("strict_alternation"),
    )
