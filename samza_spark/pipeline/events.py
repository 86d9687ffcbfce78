"""Event-sequence analytics over the events table: funnels and retention
cohorts.

These are the classic stream-analytics workloads the reference engine's
users run (windowed counts + stream-table joins over user activity, cf.
samza hello-samza wikipedia-stats and the AdCalc/AdEvent examples in
docs/learn/documentation/versioned/api/high-level-api.md); here they are
expressed as declarative Catalyst plans that also run unchanged over a
Structured Streaming source.

Scale design (100 TB of events):
- Funnel: ONE shuffle (groupBy user) collecting each user's (ts, type)
  pairs; step timestamps derive from array expressions over the sorted
  per-user list (per-user data is bounded), no per-step re-join, no
  Python.
- Retention: first-activity and active-period sets both reduce per user
  in one aggregation, explode to (cohort, offset) pairs, then one count
  shuffle keyed by the (cohort, offset) grid — the grid is tiny.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_ORIGIN_US = 0  # epoch origin for period arithmetic (UTC)


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: for each user, the earliest time each step
    could complete given the previous step had completed (classic
    min-forward scan). Returns (user, step_reached, t_<step>... epoch-µs,
    nullable past the last reached step).

    One groupBy(user) shuffle; the sequential dependency between steps is
    resolved with array expressions over the user's sorted event list, so
    no iterative joins are needed.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    evs = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros(F.col(ts_col)).alias("us"),
                F.col(type_col).alias("et"),
            )
        )
    )
    agged = df.where(F.col(type_col).isin(steps)).groupBy(user_col).agg(
        evs.alias("__evs")
    )
    # t_k = min ts of events of type steps[k] at/after t_{k-1}
    cols = {}
    prev: Column | None = None
    for s in steps:
        if prev is None:
            cand = F.filter(F.col("__evs"), lambda e: e["et"] == F.lit(s))
        else:
            p = prev
            cand = F.filter(
                F.col("__evs"),
                lambda e: (e["et"] == F.lit(s)) & (e["us"] >= p),
            )
        t = F.array_min(F.transform(cand, lambda e: e["us"]))
        cols[f"t_{s}"] = t
        prev = t
    reached = F.lit(0)
    for i, s in enumerate(steps):
        reached = F.when(F.col(f"t_{s}").isNotNull(), F.lit(i + 1)).otherwise(
            reached
        )
    out = agged.select(user_col, *(c.alias(n) for n, c in cols.items()))
    return out.withColumn("step_reached", reached.cast("int"))


def funnel_summary(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel conversion counts: (step_idx, step, n_users) where n_users
    is how many users reached at least that step."""
    per_user = funnel(df, steps, user_col, ts_col, type_col)
    aggs = [
        F.sum((F.col("step_reached") >= i + 1).cast("long")).alias(f"__n{i}")
        for i in range(len(steps))
    ]
    wide = per_user.agg(*aggs)
    pairs = []
    for i, s in enumerate(steps):
        pairs.extend(
            [F.lit(i + 1), F.struct(F.lit(s).alias("step"), F.col(f"__n{i}").alias("n"))]
        )
    m = F.create_map(*pairs)
    return (
        wide.select(F.explode(m).alias("step_idx", "sn"))
        .select(
            F.col("step_idx").cast("int").alias("step_idx"),
            F.col("sn.step").alias("step"),
            F.col("sn.n").alias("n_users"),
        )
    )


def retention_cohorts(
    df: DataFrame,
    period: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention grid: (cohort, offset, n_users) — users whose
    first activity fell in period ``cohort`` (epoch-period index) and who
    were active again ``offset`` periods later (offset 0 = the cohort
    period itself).

    One user-keyed aggregation produces (first_period, active_periods[]);
    the explode emits at most (active periods per user) rows; the final
    count groups on the tiny (cohort, offset) grid.
    """
    seconds = {"day": 86400, "week": 7 * 86400}[period]
    p = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(seconds * 1_000_000))
    per_user = df.groupBy(user_col).agg(
        F.min(p).alias("cohort"),
        F.array_sort(F.collect_set(p)).alias("__periods"),
    )
    return (
        per_user.select(
            user_col,
            "cohort",
            F.explode(
                F.transform(F.col("__periods"), lambda x: x - F.col("cohort"))
            ).alias("offset"),
        )
        .groupBy("cohort", "offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.col("cohort").cast("long").alias("cohort"),
            F.col("offset").cast("long").alias("offset"),
            F.col("n_users").cast("long").alias("n_users"),
        )
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization: assign every event a per-user
    ``session_id`` (1-based, in time order) that increments whenever the
    gap since the user's previous event exceeds ``gap``. The row-level
    counterpart of the session *window* aggregate — downstream joins and
    sequence features need the id on each event, not just the window
    summary.

    Classic two-window formulation, both windows PARTITIONED BY user (so
    every stage is parallel; per-user data is the only sort unit):
    ``new_session = (ts - lag(ts)) > gap``, ``session_id = running sum of
    new_session`` — and a deterministic (ts, event-id) order inside ties.

    Returns the input columns plus ``session_id`` and ``is_session_start``.
    """
    gap_expr = F.expr(f"INTERVAL {gap}")
    order = [F.col(ts_col).asc()] + (
        [F.col("event_id").asc()] if "event_id" in df.columns else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_sess = F.when(
        prev_ts.isNull() | (F.col(ts_col) > prev_ts + gap_expr), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("is_session_start", new_sess == 1).withColumn(
        "session_id", F.sum(new_sess).over(running).cast("long")
    )


def trailing_window_agg(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    lookback: str = "1 hour",
) -> DataFrame:
    """Per-event trailing aggregate over a true event-time RANGE frame —
    "each event with its key's count/sum over the preceding hour"
    (rate-limit audits, rolling engagement features). This is the
    RANGE-interval window Samza SQL has no analog for (its GROUP BY is
    fixed tumbling panes; SamzaSqlValidator rejects OVER entirely —
    samza-sql/.../planner/SamzaSqlValidator.java:116-127): a sliding
    window YOUR event anchors, not a pane grid.

    Integer micro-second bounds and an integer micro-unit sum keep every
    output engine-reproducible. ONE key-partitioned window, ordered by
    event time WITHIN each key — parallel across keys, no global sort;
    a hot key is a key_skew_report finding, not a plan flaw.

    Returns the input keys plus (trailing_n, trailing_sum_micro).
    """
    from samza_spark.streaming.stateful import _duration_ms

    look_us = _duration_ms(lookback) * 1000
    us = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(key_col)
        .orderBy(us.cast("long"))
        .rangeBetween(-look_us, 0)
    )
    vmicro = F.expr(f"cast(floor({value_col} * 1000000.0) as bigint)")
    return df.select(
        key_col,
        F.col("event_id"),
        us.alias("ts_us"),
        F.count(F.lit(1)).over(w).alias("trailing_n"),
        F.sum(vmicro).over(w).alias("trailing_sum_micro"),
    )


def gap_fill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
) -> DataFrame:
    """Time-series resampling with forward fill: a regular ``step`` grid
    per key spanning the key's observed range, each bucket carrying the
    bucket's LAST observation (deterministic (ts, event_id) pick) or the
    most recent earlier value (``is_gap`` marks filled rows) — the
    gap-fill/LOCF stage of metric pipelines and feature backfills.

    Scale: one (key, bucket) aggregate with map-side max_by combine, a
    tiny per-key span row exploded into its grid (bounded by
    span/step — a pathological span is a data bug this surfaces), one
    left join on (key, bucket), and ONE key-partitioned forward-fill
    window. Nothing global, no Python.
    """
    from samza_spark.streaming.stateful import _duration_ms

    step_us = _duration_ms(step) * 1000
    # integer division (div), NOT '/': bigint '/' is double division, and
    # a quotient just under an integer can round UP before the cast
    bucket = F.expr(f"unix_micros({ts_col}) div {step_us}")
    per_bucket = (
        df.select(
            F.col(key_col),
            bucket.alias("bucket"),
            F.col(value_col).alias("__v"),
            F.unix_micros(F.col(ts_col)).alias("__us"),
            F.col("event_id").alias("__eid"),
        )
        .groupBy(key_col, "bucket")
        .agg(
            F.expr("max_by(__v, struct(__us, __eid))").alias("__v")
        )
    )
    span = per_bucket.groupBy(key_col).agg(
        F.min("bucket").alias("__b0"), F.max("bucket").alias("__b1")
    )
    grid = span.select(
        key_col, F.explode(F.expr("sequence(__b0, __b1)")).alias("bucket")
    )
    joined = grid.join(per_bucket, on=[key_col, "bucket"], how="left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        (F.col("bucket") * F.lit(step_us)).alias("bucket_us"),
        F.last("__v", ignorenulls=True).over(w).alias(value_col),
        F.col("__v").isNull().alias("is_gap"),
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-session summary on top of :func:`sessionize` — the aggregate
    view (duration, event count, value sum) session analytics consume,
    composed end-to-end: two user-partitioned windows for the session
    ids, then ONE (user, session) aggregate with map-side combine.
    Value sums are fixed-point micro-units (shuffle-order-free).

    Returns (user, session_id, n_events, start_us, end_us, duration_us,
    value_sum_micro).
    """
    sess = sessionize(df, user_col=user_col, ts_col=ts_col, gap=gap)
    return (
        sess.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_micros(F.col(ts_col))).alias("start_us"),
            F.max(F.unix_micros(F.col(ts_col))).alias("end_us"),
            F.sum(
                F.expr(f"cast(floor({value_col} * 1000000.0) as bigint)")
            ).alias("value_sum_micro"),
        )
        .withColumn("duration_us", F.col("end_us") - F.col("start_us"))
    )


def ewma_per_key(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.25,
) -> DataFrame:
    """Per-key exponentially weighted moving average — the classic
    recency-weighted engagement/load feature. EWMA is inherently
    sequential (e_i = a*v_i + (1-a)*e_{i-1}, seeded with the first
    value), so it folds the key's time-ordered value list inside ONE
    aggregate: collect is bounded by events-per-key (the same per-key
    boundedness contract as funnel/sessionize), and nothing shuffles
    twice.

    Determinism: with ``alpha`` a binary fraction (0.25, 0.5...) every
    step is exactly-rounded IEEE arithmetic in a fixed order — DuckDB's
    ``list_reduce`` (first element as seed) replays it bit-for-bit.
    Returns (key, n_events, last_us, ewma).
    """
    a = float(alpha)
    if not (0.0 < a <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    vals = F.expr(
        f"transform(array_sort(collect_list(struct("
        f"unix_micros({ts_col}) as us, event_id as eid, "
        f"cast({value_col} as double) as v))), s -> s.v)"
    )
    return (
        df.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.unix_micros(F.col(ts_col))).alias("last_us"),
            vals.alias("__vals"),
        )
        .select(
            key_col,
            "n_events",
            "last_us",
            F.expr(
                f"aggregate(slice(__vals, 2, size(__vals) - 1), __vals[0], "
                f"(acc, x) -> cast({a} as double) * x + "
                f"cast({1.0 - a} as double) * acc)"
            ).alias("ewma"),
        )
    )


def scd2_intervals(
    changes: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_cols: "list[str] | None" = None,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change
    stream: one row per (key, change) with its validity interval
    ``[valid_from, valid_to)`` — ``valid_to`` NULL for the current row —
    plus a 1-based ``version``. The standard warehouse shape for
    dimension tables fed by CDC/changelog streams (the batch analog of
    the engine's Durable table changelog).

    One partitioned window per key (lead/row_number over ``ts`` with an
    optional unique ``order_tiebreak`` column for same-timestamp
    changes): no global sort, no self-join — scale-safe at any key
    cardinality.
    """
    attr_cols = attr_cols if attr_cols is not None else []
    order = [F.col(ts_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    return changes.select(
        F.col(key_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
        *[F.col(c) for c in attr_cols],
    )


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to the dimension version that was valid AT its
    timestamp: equi-join on the key with the interval containment as a
    residual filter (``valid_from <= ts < valid_to``), so Catalyst plans
    a plain hash join on ``key_col`` — per-key version counts are small
    (that's what SCD2 compaction is for), so the residual scan per probe
    is bounded; nothing quadratic, no window over facts.

    ``dim`` is :func:`scd2_intervals` output. Facts before the first
    version match nothing (inner) or survive with NULL dim columns
    (``how='left'``).
    """
    f, d = facts.alias("__f"), dim.alias("__d")
    cond = (
        (F.col(f"__f.{key_col}") == F.col(f"__d.{key_col}"))
        & (F.col(f"__f.{ts_col}") >= F.col("__d.valid_from"))
        & (
            F.col("__d.valid_to").isNull()
            | (F.col(f"__f.{ts_col}") < F.col("__d.valid_to"))
        )
    )
    return f.join(d, cond, how=how).drop(F.col(f"__d.{key_col}"))


def twap_per_key(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_us: int = 86_400_000_000,
    value_scale: int = 100,
) -> DataFrame:
    """Time-weighted average value per (key, time bucket) over
    irregularly-sampled observations — the metric that makes a value
    held for 10 hours count 10x one held for an hour (billing meters,
    position exposure, resource utilization; a plain AVG is wrong the
    moment sampling is irregular).

    Step-function semantics: each observation's value holds until the
    next one; the final observation closes the integral (zero holding
    time). Arithmetic is exact end-to-end: timestamps as epoch micros,
    values in fixed-point ``value_scale`` units (``floor(v * scale)`` —
    exact given identical doubles), the integral a DECIMAL(38,0) sum of
    value x holding-duration products (map-partition-order free), and
    the division integral ``div`` elapsed — one BIGINT out. Keys with a
    single observation in a bucket have no elapsed time and are
    excluded (documented, not NaN).

    Plan: one key+bucket-partitioned lead window + one combinable
    aggregate — no global sort. Returns
    ``(key, bucket, n_obs, twap_scaled)``.
    """
    us = F.unix_micros(F.col(ts_col))
    base = df.select(
        F.col(key_col).alias("k"),
        us.alias("t"),
        F.expr(f"cast(floor({value_col} * {int(value_scale)}.0) as bigint)").alias(
            "v"
        ),
    ).withColumn("bucket", F.expr(f"t div {int(bucket_us)}"))
    w = Window.partitionBy("k", "bucket").orderBy(F.asc("t"), F.asc("v"))
    stepped = base.withColumn("nxt", F.lead("t").over(w))
    out = (
        stepped.groupBy("k", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(
                F.expr("cast(v as decimal(38,0)) * cast(nxt - t as decimal(38,0))")
            ).alias("__num"),
            (F.max("t") - F.min("t")).alias("__den"),
        )
        .filter(F.col("__den") > 0)
        .select(
            F.col("k").alias(key_col),
            "bucket",
            "n_obs",
            F.expr("cast(__num div __den as bigint)").alias("twap_scaled"),
        )
    )
    return out


def hysteresis_alerts(
    df: DataFrame,
    hi,
    lo,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Threshold alerting with hysteresis (the monitoring-pipeline
    pattern that stops alert flapping): per key, state switches ON when
    the value exceeds ``hi`` and OFF only when it drops below ``lo`` —
    values in the dead band (lo..hi) keep the previous state. Emits one
    row per OFF→ON transition (the alert-raising edge).

    The running state is ``last(crossing) IGNORE NULLS`` over a
    key-partitioned, time-ordered window — Spark evaluates the frame
    incrementally, so this is a single parallel window pass, no
    self-join, no state blowup; the alert edge is a ``lag`` on the same
    window ordering. Keys partition the work (the sessionize shape), so
    the plan holds at any event volume. Deterministic given a unique
    (key, ts, tiebreak) ordering.

    Reference anchor: threshold monitors are the canonical low-level
    Samza task (process() + local state per key,
    samza-api/.../task/StreamTask.java:38); here the whole history
    replays as one declarative window plan.
    """
    hi_l = F.lit(hi)
    lo_l = F.lit(lo)
    order = [F.asc(ts_col), F.asc(tiebreak_col)]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    crossing = (
        F.when(F.col(value_col) > hi_l, F.lit("on"))
        .when(F.col(value_col) < lo_l, F.lit("off"))
        .otherwise(F.lit(None).cast("string"))
    )
    with_state = df.withColumn(
        "state", F.coalesce(F.last(crossing, ignorenulls=True).over(w), F.lit("off"))
    )
    wl = Window.partitionBy(key_col).orderBy(*order)
    return (
        with_state.withColumn(
            "prev_state", F.coalesce(F.lag("state").over(wl), F.lit("off"))
        )
        .filter((F.col("state") == "on") & (F.col("prev_state") == "off"))
        .drop("prev_state")
    )


def ohlc_bars(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    bucket: str = "day",
) -> DataFrame:
    """Downsample a value stream into OHLC bars (open/high/low/close +
    count) per ``(key, time bucket)`` — the classic time-series
    compaction every metrics/market pipeline runs before charting or
    modeling (the batch analog of a Samza windowed aggregate emitting
    one summary row per pane, cf. WindowOperatorImpl fold semantics).

    Open/close are the values at the FIRST and LAST row of the bucket
    under the total order ``(ts, tiebreak)`` — the tiebreaker makes the
    bars deterministic when timestamps collide (real event streams
    collide constantly at ms resolution).

    Plan: one bucket+key-partitioned window (row_number ascending and
    descending over the same ordering — Catalyst evaluates both in a
    single Window node since they share the partition spec modulo sort
    direction) followed by one combinable groupBy. No self-join, no
    global sort; each bucket sorts only its own rows, so the shape holds
    at any event volume and any key cardinality.
    """
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
    base = df.select(
        F.col(key_col).alias("k"),
        b,
        F.col(value_col).alias("v"),
        F.col(ts_col).alias("t"),
        F.col(tiebreak_col).alias("tb"),
    )
    w_asc = Window.partitionBy("k", "bucket").orderBy(F.asc("t"), F.asc("tb"))
    w_desc = Window.partitionBy("k", "bucket").orderBy(F.desc("t"), F.desc("tb"))
    ranked = base.select(
        "k",
        "bucket",
        "v",
        F.row_number().over(w_asc).alias("ra"),
        F.row_number().over(w_desc).alias("rd"),
    )
    return (
        ranked.groupBy("k", "bucket")
        .agg(
            F.max(F.when(F.col("ra") == 1, F.col("v"))).alias("open"),
            F.max("v").alias("high"),
            F.min("v").alias("low"),
            F.max(F.when(F.col("rd") == 1, F.col("v"))).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("k").alias(key_col),
            "bucket",
            "open",
            "high",
            "low",
            "close",
            "n",
        )
    )


def interval_audit(
    intervals: DataFrame,
    key_col: str = "user_id",
    start_col: str = "valid_from",
    end_col: str = "valid_to",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Integrity audit for per-key validity intervals (SCD2 histories,
    session spans, booking calendars): per key, order intervals by
    ``(start, end)`` and compare each interval's end to the next
    interval's start. Emits one row per adjacent pair that violates
    half-open tiling — ``kind='overlap'`` when ``end > next_start``
    (two versions claim the same instant) and ``kind='gap'`` when
    ``end < next_start`` (uncovered time), with the discrepancy in
    exact microseconds. Clean histories return zero rows, which is what
    a data-quality gate asserts.

    A NULL ``end`` (open/current interval) overlaps any later start —
    two open rows for one key is the classic double-current SCD2 bug.

    Plan: one key-partitioned lead window — the sessionize shape; no
    self-join, no global sort, scale-safe at any key cardinality.
    """
    order = [F.asc(start_col), F.asc_nulls_last(end_col)]
    if tiebreak_col:
        order.append(F.asc(tiebreak_col))
    w = Window.partitionBy(key_col).orderBy(*order)
    nxt = F.lead(start_col).over(w)
    us = lambda c: F.unix_micros(c)  # noqa: E731
    delta = F.when(
        F.col(end_col).isNull(), F.lit(None).cast("long")
    ).otherwise(us(nxt) - us(F.col(end_col)))
    audited = intervals.select(
        F.col(key_col),
        F.col(start_col),
        F.col(end_col),
        nxt.alias("next_start"),
        delta.alias("delta_us"),
    ).filter(F.col("next_start").isNotNull())
    return audited.select(
        key_col,
        start_col,
        end_col,
        "next_start",
        F.when(F.col(end_col).isNull() | (F.col("delta_us") < 0), F.lit("overlap"))
        .when(F.col("delta_us") > 0, F.lit("gap"))
        .otherwise(F.lit("ok"))
        .alias("kind"),
        F.coalesce(F.abs("delta_us"), F.lit(-1)).alias("discrepancy_us"),
    ).filter(F.col("kind") != "ok")


def seasonal_anomaly(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    season: str = "hour",
    k_mad: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Seasonal-baseline anomaly detection: build a robust (median/MAD)
    baseline per ``(key, season-of-day)`` cell — e.g. error rates at
    3 AM have a different normal than at noon — then flag every event
    whose value deviates from its cell's median by more than
    ``k_mad`` MADs. The robust pair shrugs off the outliers it is
    hunting (a mean/stddev baseline gets dragged by them).

    Exactness: values are fixed-pointed to ``scale`` micro-units, and
    the test uses the doubled-median trick from
    :func:`~samza_spark.pipeline.stats.group_robust_stats` — with
    ``med_x2 = x_lo + x_hi`` and ``mad_x4`` both exact BIGINTs, the flag
    condition ``|x - med| > k * MAD`` is evaluated as the integer
    inequality ``2 * |2x - med_x2| > k * mad_x4`` (both sides are the
    original times 4). No float comparison anywhere, so the verdict
    hashes identically on any engine.

    Plan: the baseline is two season-partitioned rank windows (the
    robust-stats shape) over the ~keys×24 cell grid; the flagging join
    is an equi-join against that tiny baseline table (broadcast at any
    corpus size). One scan, no quadratic step.
    """
    from samza_spark.pipeline.stats import group_robust_stats

    cell = F.concat_ws(
        "|", F.col(key_col), F.date_part(F.lit(season), F.col(ts_col)).cast("string")
    )
    fixed = df.select(
        F.col(id_col),
        F.col(key_col),
        F.col(ts_col),
        cell.alias("__cell"),
        F.round(F.col(value_col) * F.lit(scale)).cast("long").alias("__x"),
    )
    baseline = group_robust_stats(fixed, "__cell", "__x", id_col)
    joined = fixed.join(F.broadcast(baseline), on="__cell")
    dev4 = F.lit(2) * F.abs(F.lit(2) * F.col("__x") - F.col("med_x2"))
    return (
        joined.filter(dev4 > F.lit(int(k_mad)) * F.col("mad_x4"))
        .select(
            id_col,
            key_col,
            ts_col,
            (F.col("__x").cast("double") / F.lit(float(scale))).alias("value"),
            F.col("__x").alias("value_micro"),
            F.col("med_x2"),
            F.col("mad_x4"),
        )
    )


def sequence_patterns(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    top_k: int = 20,
) -> DataFrame:
    """Sequential pattern mining over per-key event streams: count every
    length-3 consecutive event-type sequence (trigram) across all keys
    and return the ``top_k`` with exact integer-ppm support — the
    behavioral-motif workload (what do users do right before
    purchasing?) that sits between the funnel (fixed steps) and the
    transition matrix (order 1).

    Plan: trigrams come from two ``lead`` columns on ONE key-partitioned
    time-ordered window (no self-joins on position), then one combinable
    (e1, e2, e3) count over the tiny type³ domain; the scalar total
    broadcasts back and the top-k is TakeOrderedAndProject. Holds at any
    event volume — nothing ever sorts or pairs the raw stream.
    """
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(tiebreak_col))
    tri = (
        df.select(
            F.col(type_col).alias("e1"),
            F.lead(type_col, 1).over(w).alias("e2"),
            F.lead(type_col, 2).over(w).alias("e3"),
        )
        .filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    )
    counts = tri.groupBy("e1", "e2", "e3").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__t"))
    return (
        counts.join(F.broadcast(total))
        .select(
            "e1",
            "e2",
            "e3",
            "n",
            F.expr("(n * 1000000) div __t").alias("support_ppm"),
        )
        .orderBy(F.desc("n"), F.asc("e1"), F.asc("e2"), F.asc("e3"))
        .limit(int(top_k))
    )


def periodicity(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    min_gaps: int = 4,
) -> DataFrame:
    """Per-key periodicity / regularity detection: the robust
    (median, MAD) profile of inter-event gaps. A key whose MAD is small
    relative to its median gap fires on a regular cadence (cron-like
    bots, heartbeats); a bursty human has MAD on the order of the
    median. ``regularity_ppm = (mad_x4 * 1e6) div (2 * med_x2)`` is the
    exact integer MAD/median ratio in ppm — 0 for perfect periodicity.

    Gaps are one key-partitioned lag window (exact microseconds); the
    median/MAD pair reuses the all-integer doubled-median machinery of
    :func:`samza_spark.pipeline.stats.group_robust_stats`. Keys with
    fewer than ``min_gaps`` gaps are excluded (a 2-event key is trivially
    "periodic"). No float arithmetic anywhere.
    """
    from samza_spark.pipeline.stats import group_robust_stats

    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(tiebreak_col))
    gaps = (
        df.select(
            F.col(key_col).alias("k"),
            F.col(tiebreak_col).alias("i"),
            (
                F.unix_micros(F.col(ts_col))
                - F.lag(F.unix_micros(F.col(ts_col))).over(w)
            ).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    stats = group_robust_stats(gaps, "k", "gap_us", "i")
    return (
        stats.filter(F.col("n") >= F.lit(int(min_gaps)))
        .select(
            F.col("k").alias(key_col),
            F.col("n").alias("n_gaps"),
            "med_x2",
            "mad_x4",
            F.when(
                F.col("med_x2") > 0,
                F.expr("(mad_x4 * 1000000) div (2 * med_x2)"),
            )
            .otherwise(F.lit(None).cast("long"))
            .alias("regularity_ppm"),
        )
    )


def rolling_active_users(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """EXACT rolling N-day active-user counts (the WAU/MAU curve): for
    each day ``w``, the number of distinct users active in
    ``(w - N, w]``. Spark windows cannot COUNT(DISTINCT) over a frame,
    and approximate sketches change the answer — the exact distributed
    formulation is contribution explosion: reduce to distinct
    ``(user, active_day)`` pairs (corpus-scale dedup, ONE shuffle),
    explode each pair to the ≤N window-ends it contributes to (grid
    rows, not event rows), distinct again on ``(user, window_end)``
    (a user active twice inside one window counts once), then one
    combinable count per window end. Shuffle volume after the first
    dedup is |users| × N — independent of event volume.

    Windows are calendar days; only window ends that fall inside the
    observed day span are emitted (no partial-future windows).
    """
    day = F.unix_seconds(F.date_trunc("day", F.col(ts_col)))
    ud = df.select(F.col(user_col).alias("u"), day.alias("d")).distinct()
    bounds = ud.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    n = int(window_days)
    contrib = (
        ud.join(F.broadcast(bounds))
        .select(
            "u",
            F.explode(
                F.expr(
                    f"sequence(d, least(d + {n - 1} * 86400L, hi), 86400)"
                )
            ).alias("w"),
        )
        .distinct()
    )
    return (
        contrib.groupBy("w")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .select(F.col("w").alias("window_end_s"), "active_users")
    )


def last_touch_attribution(
    df: DataFrame,
    conversion_type: str = "purchase",
    touch_type: str = "click",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    lookback: str = "7 days",
) -> DataFrame:
    """Last-touch marketing attribution: credit each conversion event to
    the key's most recent ``touch_type`` event strictly before it and
    within ``lookback``; conversions with no qualifying touch are
    emitted unattributed (NULL touch columns). The canonical
    click→purchase credit assignment behind ad-spend reporting.

    One key-partitioned time-ordered window does all the work:
    ``last(touch_id IGNORE NULLS)`` over the rows-preceding frame finds
    the latest prior touch without a self-join or per-conversion scan
    (the asof-join collapsed into a window because both sides live in
    one stream). The lookback check is exact microsecond arithmetic.
    Deterministic under the (ts, id) total order; keys partition the
    work, so the plan holds at any event volume.
    """
    us = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.asc(ts_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_id = F.when(F.col(type_col) == touch_type, F.col(id_col))
    touch_us = F.when(F.col(type_col) == touch_type, us)
    # interval -> exact µs via epoch arithmetic (Spark has no
    # extract(epoch FROM interval))
    lb_us = F.expr(
        f"unix_micros(timestamp'1970-01-01 00:00:00Z' + INTERVAL {lookback})"
    )
    enriched = df.select(
        F.col(key_col),
        F.col(id_col),
        F.col(type_col),
        us.alias("__us"),
        F.last(touch_id, ignorenulls=True).over(w).alias("__tid"),
        F.last(touch_us, ignorenulls=True).over(w).alias("__tus"),
    )
    conv = enriched.filter(F.col(type_col) == conversion_type)
    in_window = F.col("__tus").isNotNull() & (
        F.col("__us") - F.col("__tus") <= lb_us
    )
    return conv.select(
        F.col(key_col),
        F.col(id_col).alias("conversion_id"),
        F.col("__us").alias("conversion_us"),
        F.when(in_window, F.col("__tid")).alias("touch_id"),
        F.when(in_window, F.col("__tus")).alias("touch_us"),
        F.when(in_window, F.col("__us") - F.col("__tus")).alias("delay_us"),
    )


def conversion_delay_ecdf(
    df: DataFrame,
    start_type: str = "signup",
    end_type: str = "purchase",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert ECDF at day granularity: per key, the delay from
    its FIRST ``start_type`` event to its FIRST ``end_type`` event; keys
    whose first end precedes their first start are excluded (ambiguous
    attribution — they "converted" before entering). The exact
    cumulative distribution over whole-day delay buckets follows —
    ``cum_ppm`` of converters who converted within d days. The
    survival-analysis view (Kaplan-Meier without censoring) behind
    activation dashboards and cohort SLAs.

    ONE key-keyed aggregate computes both firsts (conditional min —
    no self-join between the two event subsets); the ECDF runs on the
    tiny day-bucket domain (combinable count + one cumulative window +
    a broadcast scalar). Integer arithmetic throughout.
    """
    us = F.unix_micros(F.col(ts_col))
    per_key = (
        df.filter(F.col(type_col).isin([start_type, end_type]))
        .groupBy(key_col)
        .agg(
            F.min(F.when(F.col(type_col) == start_type, us)).alias("__s"),
            F.min(F.when(F.col(type_col) == end_type, us)).alias("__e_any"),
        )
    )
    # first-end-before-first-start keys drop (docstring contract)
    delays = per_key.filter(
        F.col("__s").isNotNull()
        & F.col("__e_any").isNotNull()
        & (F.col("__e_any") >= F.col("__s"))
    ).select(
        F.expr("(__e_any - __s) div 86400000000").alias("delay_days")
    )
    counts = delays.groupBy("delay_days").agg(F.count(F.lit(1)).alias("n_users"))
    total = counts.agg(F.sum("n_users").alias("__t"))
    w = Window.orderBy(F.asc("delay_days")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # the cumulative window runs on the day-bucket domain (≤ observation
    # span in days) — a bounded single-partition stage by construction
    return (
        counts.join(F.broadcast(total))
        .select(
            "delay_days",
            "n_users",
            F.sum("n_users").over(w).alias("cum_users"),
            "__t",
        )
        .select(
            "delay_days",
            "n_users",
            "cum_users",
            F.expr("(cum_users * 1000000) div __t").alias("cum_ppm"),
        )
    )


def ab_test_report(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    conversion_type: str = "purchase",
    salt: str = "exp0",
) -> DataFrame:
    """Deterministic A/B experiment readout: users hash into arm A or B
    by the cross-engine md5 bucket (same machinery as
    :func:`samza_spark.pipeline.sampling.assign_split` — a user's arm
    never changes as data grows), conversion = at least one
    ``conversion_type`` event. One row: per-arm user and converter
    counts, per-arm conversion in exact ppm, and the relative lift of B
    over A in ppm (integer division — the sqrt-free exact part of the
    readout; significance testing needs floats and is left downstream).

    ONE user-keyed aggregate (arm is a map-side expression on the
    already-grouped key), then a two-row arm rollup pivoted into the
    summary. Scale-safe: nothing but the per-user reduction touches the
    event volume.
    """
    from samza_spark.pipeline.sampling import _hash_bucket

    per_user = df.groupBy(F.col(key_col).alias("u")).agg(
        F.max((F.col(type_col) == conversion_type).cast("long")).alias("conv")
    )
    armed = per_user.select(
        _hash_bucket("u", salt, 2).alias("arm"), "conv"
    )
    arms = armed.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("conv").alias("c"),
    )
    pivoted = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("c"))).alias("conv_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("c"))).alias("conv_b"),
    )
    return pivoted.select(
        "n_a",
        "conv_a",
        F.expr("(conv_a * 1000000) div n_a").alias("rate_a_ppm"),
        "n_b",
        "conv_b",
        F.expr("(conv_b * 1000000) div n_b").alias("rate_b_ppm"),
        F.expr(
            "CASE WHEN conv_a > 0 THEN "
            "((conv_b * n_a - conv_a * n_b) * 1000000) div (conv_a * n_b) END"
        ).alias("lift_ppm"),
    )


def ohlc_bars_agg(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    bucket: str = "day",
) -> DataFrame:
    """Streaming-compatible OHLC form: open/close via ``min_by/max_by``
    over the ``(ts, tiebreak)`` struct order — pure COMBINABLE aggregates
    (partial states merge associatively), so the same expression runs
    under a watermarked streaming groupBy where the window-function form
    of :func:`ohlc_bars` cannot (row_number needs the whole pane). Batch
    output is identical to :func:`ohlc_bars` (property-tested); batch
    plans prefer the window form only because its DuckDB oracle is
    simpler — at scale the two shapes cost the same one shuffle.
    """
    ordk = F.struct(F.col(ts_col), F.col(tiebreak_col))
    return (
        df.groupBy(
            F.col(key_col),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        )
        .agg(
            F.min_by(F.col(value_col), ordk).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(F.col(value_col), ordk).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def nearest_event_join(
    df: DataFrame,
    left_type: str,
    right_type: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Bidirectional nearest-in-time join WITHIN one stream: each
    ``left_type`` event paired with the temporally closest
    ``right_type`` event of the same key, looking both backward and
    forward (the symmetric generalization of the asof join, which only
    looks back). Ties at equal distance resolve backward (the earlier
    candidate) — deterministic under the (ts, id) total order. Events
    with no candidate in either direction emit NULLs.

    Plan: NO self-join — the union-stream trick: two ignore-nulls
    ``last`` windows over the same key partition (one time-ascending for
    the nearest predecessor, one time-descending for the nearest
    successor), then a map-side pick of the closer side. Exact signed
    microsecond deltas. Keys partition all work.
    """
    us = F.unix_micros(F.col(ts_col))
    r_id = F.when(F.col(type_col) == right_type, F.col(id_col))
    r_us = F.when(F.col(type_col) == right_type, us)
    wb = (
        Window.partitionBy(key_col)
        .orderBy(F.asc(ts_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy(key_col)
        .orderBy(F.desc(ts_col), F.desc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    enriched = df.select(
        F.col(key_col),
        F.col(id_col),
        F.col(type_col),
        us.alias("__us"),
        F.last(r_id, ignorenulls=True).over(wb).alias("__pid"),
        F.last(r_us, ignorenulls=True).over(wb).alias("__pus"),
        F.last(r_id, ignorenulls=True).over(wf).alias("__nid"),
        F.last(r_us, ignorenulls=True).over(wf).alias("__nus"),
    ).filter(F.col(type_col) == left_type)
    take_next = F.col("__pus").isNull() | (
        F.col("__nus").isNotNull()
        & ((F.col("__nus") - F.col("__us")) < (F.col("__us") - F.col("__pus")))
    )
    nid = F.when(take_next, F.col("__nid")).otherwise(F.col("__pid"))
    nus = F.when(take_next, F.col("__nus")).otherwise(F.col("__pus"))
    return enriched.select(
        F.col(key_col),
        F.col(id_col).alias("left_id"),
        F.col("__us").alias("left_us"),
        nid.alias("nearest_id"),
        nus.alias("nearest_us"),
        (nus - F.col("__us")).alias("delta_us"),
    )


def running_balance(
    df: DataFrame,
    delta_col: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    floor_at: int = 0,
) -> DataFrame:
    """Per-key clamped running balance: fold each key's time-ordered
    integer deltas with ``balance = max(floor, balance + delta)`` — the
    inventory/credit/quota semantics where a balance cannot go below the
    floor. This fold is NON-associative (clamping loses information), so
    no window/aggregate combination can express it; it is the canonical
    arbitrary-stateful-per-key computation (the reference's StreamTask +
    local store shape, StreamTask.java:38) — and the exact case where
    the right Spark form is a bounded per-key array fold, not a window.

    ONE groupBy(key) collects each key's (ts, id, delta) triples
    (per-key data bounded — the sessionize/funnel contract), sorts
    in-row, and folds with ``aggregate`` entirely JVM-side. Returns
    ``(key, n_events, final_balance, n_clamps)`` where ``n_clamps``
    counts how often the raw sum dipped below the floor.
    """
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros(F.col(ts_col)).alias("us"),
                F.col(id_col).alias("i"),
                F.col(delta_col).cast("long").alias("d"),
            )
        )
    )
    fl = int(floor_at)
    fold = F.expr(
        "aggregate(__arr, struct(CAST({fl} AS BIGINT) AS bal, "
        "CAST(0 AS BIGINT) AS clamps), (acc, x) -> struct("
        "greatest(acc.bal + x.d, CAST({fl} AS BIGINT)), "
        "acc.clamps + IF(acc.bal + x.d < {fl}, 1, 0)))".format(fl=fl)
    )
    return (
        df.groupBy(key_col)
        .agg(arr.alias("__arr"))
        .select(
            key_col,
            F.size("__arr").cast("long").alias("n_events"),
            fold.alias("__f"),
        )
        .select(
            key_col,
            "n_events",
            F.col("__f.bal").alias("final_balance"),
            F.col("__f.clamps").alias("n_clamps"),
        )
    )


def cohort_ltv(
    df: DataFrame,
    value_type: str = "purchase",
    period: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Cohort lifetime-value accumulation: users cohorted by first-
    activity period (ANY event type — same cohort definition as
    :func:`retention_cohorts`); each cohort's ``value_type`` revenue is
    summed per period offset and accumulated — the LTV curve finance
    reads cohort paybacks from. Revenue is exact integer cents.

    One user aggregate pins cohorts, one equi-join tags revenue events,
    one (cohort, offset) combinable sum, and ONE cumulative window
    partitioned by cohort over the tiny cohort×offset grid.
    """
    seconds = {"day": 86400, "week": 7 * 86400}[period]
    p = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(seconds * 1_000_000))
    cohorts = df.groupBy(user_col).agg(F.min(p).alias("cohort"))
    rev = (
        df.filter(F.col(type_col) == value_type)
        .select(
            user_col,
            p.alias("__p"),
            F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        )
        .join(cohorts, on=user_col)
        .groupBy("cohort", (F.col("__p") - F.col("cohort")).alias("offset"))
        .agg(
            F.sum("cents").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_purchases"),
        )
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy(F.asc("offset"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rev.select(
        F.col("cohort").cast("long").alias("cohort"),
        F.col("offset").cast("long").alias("offset"),
        "n_purchases",
        "revenue_cents",
        F.sum("revenue_cents").over(w).alias("cum_revenue_cents"),
    )


def slo_burn_alerts(
    df: DataFrame,
    error_type: str = "error",
    ts_col: str = "ts",
    type_col: str = "event_type",
    short_hours: int = 1,
    long_hours: int = 6,
    short_thr_ppm: int = 250_000,
    long_thr_ppm: int = 220_000,
) -> DataFrame:
    """Multi-window SLO burn-rate alerting (the Google SRE workbook
    policy): fire only when the error rate exceeds its threshold in BOTH
    a short and a long trailing window — the short window gives fast
    detection, the long one suppresses blips. Rates are exact integer
    ppm over hour buckets; the trailing windows are RANGE frames on the
    integer epoch-hour axis, so missing hours (no traffic) neither crash
    nor silently shrink the window.

    ONE corpus-scale (hour) aggregate; everything after runs on the
    hour grid. Returns one row per alerting hour with both rates.
    """
    # integer division — a double quotient could truncate across the
    # boundary differently than the oracle's floor division
    hour = F.expr(f"unix_micros({ts_col}) div 3600000000")
    grid = df.groupBy(hour.alias("h")).agg(
        F.count(F.lit(1)).alias("tot"),
        F.sum((F.col(type_col) == error_type).cast("long")).alias("err"),
    )
    ws = (
        Window.orderBy(F.asc("h"))
        .rangeBetween(-(int(short_hours) - 1), 0)
    )
    wl = (
        Window.orderBy(F.asc("h"))
        .rangeBetween(-(int(long_hours) - 1), 0)
    )
    # hour-grid windows: bounded by the observation span in hours
    rated = grid.select(
        "h",
        F.sum("err").over(ws).alias("err_s"),
        F.sum("tot").over(ws).alias("tot_s"),
        F.sum("err").over(wl).alias("err_l"),
        F.sum("tot").over(wl).alias("tot_l"),
    ).select(
        "h",
        F.expr("(err_s * 1000000) div tot_s").alias("short_ppm"),
        F.expr("(err_l * 1000000) div tot_l").alias("long_ppm"),
    )
    return rated.filter(
        (F.col("short_ppm") > F.lit(int(short_thr_ppm)))
        & (F.col("long_ppm") > F.lit(int(long_thr_ppm)))
    ).select(
        (F.col("h") * 3600).alias("hour_s"), "short_ppm", "long_ppm"
    )


def rfm_segments(
    df: DataFrame,
    value_type: str = "purchase",
    n_tiles: int = 5,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """RFM customer segmentation: per key, Recency (days since last
    ``value_type`` event, measured from the stream head), Frequency
    (count), Monetary (exact cents) — each scored 1..``n_tiles`` by
    ntile (recency reversed: most recent = highest score), combined
    into the classic 3-digit segment code. Determinism: every ntile
    orders with the key as tiebreak, so equal metrics still split
    reproducibly.

    One key aggregate (corpus-scale) + three ntile windows over the
    per-key table + a broadcast scalar for the stream head.
    """
    base = df.filter(F.col(type_col) == value_type)
    head = base.agg(F.max(F.unix_micros(F.col(ts_col))).alias("__head"))
    per_key = base.groupBy(key_col).agg(
        F.max(F.unix_micros(F.col(ts_col))).alias("__last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col(value_col) * 100).cast("long")).alias(
            "monetary_cents"
        ),
    )
    from samza_spark.operators.rank import global_rank

    n = int(n_tiles)
    enriched = per_key.join(F.broadcast(head)).select(
        key_col,
        F.expr("(__head - __last) div 86400000000").alias("recency_days"),
        "frequency",
        "monetary_cents",
    )
    # ntile via the closed form over range-exchange global ranks — a bare
    # ntile() window has no PARTITION BY, i.e. a single-partition sort of
    # the whole per-key table; at 1e9 users that is one straggler task.
    # Spark's ntile semantics: with c rows and n tiles, the first c % n
    # tiles hold (c div n)+1 rows. Identical closed form both engines.
    c = enriched.count()

    def tile(rank_col: str) -> "Column":
        q, r = c // n, c % n
        big = r * (q + 1)
        # integer div end-to-end — a double quotient could truncate wrong
        # at huge row counts
        return F.expr(
            f"CAST(CASE WHEN {rank_col} <= {big} "
            f"THEN ({rank_col} - 1) div {q + 1} "
            f"ELSE {r} + ({rank_col} - {big} - 1) div {max(q, 1)} END "
            "AS INT) + 1"
        )

    out = global_rank(
        enriched, [F.asc("recency_days"), F.asc(key_col)], rank_col="__rr"
    )
    out = global_rank(
        out, [F.desc("frequency"), F.asc(key_col)], rank_col="__rf"
    )
    out = global_rank(
        out, [F.desc("monetary_cents"), F.asc(key_col)], rank_col="__rm"
    )
    return out.select(
        key_col,
        "recency_days",
        "frequency",
        "monetary_cents",
        tile("__rr").alias("r_score"),
        tile("__rf").alias("f_score"),
        tile("__rm").alias("m_score"),
    ).withColumn(
        "segment",
        (F.lit(n + 1) - F.col("r_score")) * 100
        + (F.lit(n + 1) - F.col("f_score")) * 10
        + (F.lit(n + 1) - F.col("m_score")),
    )


def funnel_with_exclusion(
    df: DataFrame,
    steps: list[str],
    excluded: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel with EXCLUSION steps (the Amplitude/Mixpanel
    "did A then B without doing X in between" query): the funnel
    completes step k only if no excluded event fires STRICTLY between
    the previous step's completion and the candidate completion — an
    intervening excluded event kills the funnel at that step (t_k and
    everything after become NULL).

    Same one-shuffle shape as :func:`funnel`: one groupBy(user)
    collecting the sorted (ts, type) list over the relevant types; the
    sequential min-forward chain WITH the exclusion veto evaluates as
    array expressions over the bounded per-user list — no per-step
    joins, no Python.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    relevant = list(steps) + list(excluded)
    evs = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros(F.col(ts_col)).alias("us"),
                F.col(type_col).alias("et"),
            )
        )
    )
    agged = (
        df.where(F.col(type_col).isin(relevant))
        .groupBy(user_col)
        .agg(evs.alias("__evs"))
    )
    cols = {}
    prev: Column | None = None
    for s in steps:
        if prev is None:
            t = F.array_min(
                F.transform(
                    F.filter(F.col("__evs"), lambda e: e["et"] == F.lit(s)),
                    lambda e: e["us"],
                )
            )
        else:
            p = prev
            cand = F.array_min(
                F.transform(
                    F.filter(
                        F.col("__evs"),
                        lambda e: (e["et"] == F.lit(s)) & (e["us"] >= p),
                    ),
                    lambda e: e["us"],
                )
            )
            veto = F.array_min(
                F.transform(
                    F.filter(
                        F.col("__evs"),
                        lambda e: e["et"].isin(excluded)
                        & (e["us"] > p)
                        & (e["us"] < cand),
                    ),
                    lambda e: e["us"],
                )
            )
            t = F.when(cand.isNotNull() & veto.isNull(), cand)
        cols[f"t_{s}"] = t
        prev = t
    reached = F.lit(0)
    for i, s in enumerate(steps):
        reached = F.when(F.col(f"t_{s}").isNotNull(), F.lit(i + 1)).otherwise(
            reached
        )
    out = agged.select(user_col, *(c.alias(n) for n, c in cols.items()))
    return out.withColumn("step_reached", reached.cast("int"))


def churn_analysis(
    df: DataFrame,
    period: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Period-over-period churn accounting: for every consecutive period
    pair, how many users were retained (active in both), churned
    (active in p, gone in p+1), and new (absent in p, active in p+1).
    The week-over-week health triplet product dashboards lead with —
    complementary to the cohort grid (:func:`retention_cohorts` tracks
    return offsets; this tracks the period-boundary flux).

    Distinct (user, period) reduction (ONE corpus shuffle), then a
    self-join on the shifted period key over the users×periods table and
    a combinable per-period rollup. Only periods with a successor are
    emitted.
    """
    seconds = {"day": 86400, "week": 7 * 86400}[period]
    p = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(seconds * 1_000_000)).cast(
        "long"
    )
    up = df.select(F.col(user_col).alias("u"), p.alias("p")).distinct()
    cur = up.withColumn("__c", F.lit(1))
    nxt = up.select("u", (F.col("p") - 1).alias("p")).withColumn(
        "__n", F.lit(1)
    )
    flux = cur.join(nxt, on=["u", "p"], how="outer")
    periods = up.agg(F.max("p").alias("__maxp"))
    return (
        flux.join(F.broadcast(periods))
        .filter(F.col("p") < F.col("__maxp"))
        .groupBy("p")
        .agg(
            F.sum(
                (F.col("__c").isNotNull() & F.col("__n").isNotNull()).cast(
                    "long"
                )
            ).alias("retained"),
            F.sum(
                (F.col("__c").isNotNull() & F.col("__n").isNull()).cast("long")
            ).alias("churned"),
            F.sum(
                (F.col("__c").isNull() & F.col("__n").isNotNull()).cast("long")
            ).alias("new_users"),
        )
        .select(F.col("p").alias("period"), "retained", "churned", "new_users")
    )


def activity_streaks(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user consecutive-day activity streaks — the textbook
    gaps-and-islands pattern: island id = ``day − dense_rank(day)`` is
    constant exactly across consecutive runs, so one per-user window +
    one (user, island) rollup yields every streak; the longest and the
    CURRENT streak (the one touching the user's last active day) follow
    from a per-user max. Exact integer day arithmetic.

    Plan: distinct (user, day) reduction, one user-partitioned rank
    window over per-user day lists (bounded), two combinable rollups.
    """
    day = F.expr(f"unix_micros({ts_col}) div 86400000000")
    ud = df.select(F.col(user_col).alias("u"), day.alias("d")).distinct()
    w = Window.partitionBy("u").orderBy(F.asc("d"))
    islands = ud.select(
        "u", "d", (F.col("d") - F.dense_rank().over(w)).alias("isl")
    )
    streaks = islands.groupBy("u", "isl").agg(
        F.count(F.lit(1)).alias("len"), F.max("d").alias("last_d")
    )
    per_user = streaks.groupBy("u").agg(
        F.max("len").alias("longest_streak"),
        F.max(F.struct("last_d", "len")).alias("__last"),
        F.count(F.lit(1)).alias("n_streaks"),
    )
    return per_user.select(
        F.col("u").alias(user_col),
        "longest_streak",
        F.col("__last.len").alias("current_streak"),
        F.col("__last.last_d").alias("last_active_day"),
        "n_streaks",
    )


def latency_log2_histogram(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """HdrHistogram-style inter-arrival latency histogram with
    power-of-two buckets: per key, gaps between consecutive events land
    in bucket ``floor(log2(gap_us))`` — computed EXACTLY as
    ``length(bin(gap)) - 1`` (the bit length of the integer, no float
    log anywhere), the standard trick that makes log-scale latency
    observability engine-exact. Emits per (key, bucket): count and the
    exact min/max gap seen.

    One key-partitioned lag window for gaps + one combinable
    (key, bucket) count. The bucket domain is ≤ 63 rows per key.
    """
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(id_col))
    us = F.unix_micros(F.col(ts_col))
    gaps = (
        df.select(
            F.col(key_col),
            (us - F.lag(us).over(w)).alias("gap_us"),
        )
        .filter(F.col("gap_us") > 0)
    )
    bucket = (F.length(F.expr("bin(gap_us)")) - 1).cast("int")
    return (
        gaps.select(key_col, "gap_us", bucket.alias("log2_bucket"))
        .groupBy(key_col, "log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
    )


def path_deviation(
    df: DataFrame,
    canonical: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    gap: str = "30 minutes",
    top_k: int = 50,
) -> DataFrame:
    """Session path alignment: each session's event path (first letters
    of event types, time-ordered) scored by Levenshtein distance to a
    canonical path — the UX-flow deviation audit ("how far do real
    sessions stray from view→click→purchase?"). Integer edit distances;
    top-k most deviant sessions by (distance DESC, user, session).

    Composes :func:`sessionize` (two user-partitioned windows) with ONE
    (user, session) aggregate collecting the bounded per-session path;
    the DP runs JVM-side per session string.
    """
    sess = sessionize(df, user_col=user_col, ts_col=ts_col, gap=gap)
    tiebreak = (
        F.col("event_id") if "event_id" in df.columns else F.lit(0)
    )
    path = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.unix_micros(F.col(ts_col)).alias("us"),
                        tiebreak.alias("i"),
                        F.substring(F.col(type_col), 1, 1).alias("c"),
                    )
                )
            ),
            lambda e: e["c"],
        ),
        "",
    )
    return (
        sess.groupBy(user_col, "session_id")
        .agg(path.alias("path"), F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            "session_id",
            "path",
            "n_events",
            F.levenshtein(F.col("path"), F.lit(canonical)).alias("distance"),
        )
        .orderBy(F.desc("distance"), F.asc(user_col), F.asc("session_id"))
        .limit(int(top_k))
    )


def dialogue_turns(
    df: DataFrame,
    role_of: "dict[str, str] | None" = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    gap: str = "30 minutes",
) -> DataFrame:
    """Conversation-thread assembly over an event stream — the shape a
    chat/instruction-data pipeline runs to turn raw interleaved messages
    into per-thread turn structure before transcript export: sessionize,
    map each event to a ``role`` (default: view/click -> 'user', all else
    -> 'assistant'), collapse consecutive same-role runs into TURNS, and
    emit per-session turn statistics.

    Output per (user, session): ``n_events, n_turns, first_role,
    last_role, starts_user, strict_alternation`` (every turn is length 1
    — the well-formed dialogue invariant an SFT exporter enforces).

    Plan: one sessionize (two per-user windows) + one lag window + one
    groupBy(user, session) — every stage is partitioned by user, no
    global sort; state per group is O(1) aggregates, never the collected
    transcript.
    """
    role_of = role_of or {"view": "user", "click": "user"}
    mapping = F.create_map(
        *[F.lit(x) for kv in role_of.items() for x in kv]
    )
    s = sessionize(df, user_col=user_col, ts_col=ts_col, gap=gap)
    order = [F.col(ts_col).asc()] + (
        [F.col("event_id").asc()] if "event_id" in df.columns else []
    )
    w = Window.partitionBy(user_col, "session_id").orderBy(*order)
    s = s.withColumn(
        "__role", F.coalesce(mapping[F.col(type_col)], F.lit("assistant"))
    ).withColumn(
        "__new_turn",
        F.when(
            F.lag("__role").over(w).isNull()
            | (F.col("__role") != F.lag("__role").over(w)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("__new_turn").cast("long").alias("n_turns"),
        F.expr(f"min_by(__role, struct({ts_col}, event_id))").alias("first_role"),
        F.expr(f"max_by(__role, struct({ts_col}, event_id))").alias("last_role"),
        (
            F.expr(f"min_by(__role, struct({ts_col}, event_id))") == F.lit("user")
        ).alias("starts_user"),
        (F.sum("__new_turn") == F.count(F.lit(1))).alias("strict_alternation"),
    )


def sft_transcripts(
    df: DataFrame,
    role_of: "dict[str, str] | None" = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    gap: str = "30 minutes",
) -> DataFrame:
    """Chat-format transcript export — the SFT training artifact: each
    (user, session) becomes ONE JSON "messages" array in the standard
    chat shape ``[{"role": ..., "content": ...}, ...]``, with consecutive
    same-role events merged into a single message (content = the
    space-joined event payloads in time order), ready for JSONL export.

    Composes :func:`sessionize` + the :func:`dialogue_turns` run-collapse:
    turn ids come from the running sum of role changes, one aggregate
    groups (user, session, turn) into messages, one more assembles the
    ordered message array and serializes with ``to_json`` (whose compact
    output is byte-identical to DuckDB's ``json_object``, so the export
    is oracle-checkable end-to-end). Every stage is partitioned by user;
    message arrays are session-bounded.
    """
    role_of = role_of or {"view": "user", "click": "user"}
    mapping = F.create_map(*[F.lit(x) for kv in role_of.items() for x in kv])
    s = sessionize(df, user_col=user_col, ts_col=ts_col, gap=gap)
    order = [F.col(ts_col).asc()] + (
        [F.col("event_id").asc()] if "event_id" in df.columns else []
    )
    w = Window.partitionBy(user_col, "session_id").orderBy(*order)
    run = Window.partitionBy(user_col, "session_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = (
        s.withColumn(
            "__role", F.coalesce(mapping[F.col(type_col)], F.lit("assistant"))
        )
        .withColumn(
            "__new_turn",
            F.when(
                F.lag("__role").over(w).isNull()
                | (F.col("__role") != F.lag("__role").over(w)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("__turn", F.sum("__new_turn").over(run).cast("long"))
    )
    msgs = s.groupBy(user_col, "session_id", "__turn").agg(
        F.min("__role").alias("role"),  # constant within a turn
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.unix_micros(F.col(ts_col)).alias("us"),
                            F.col("event_id").alias("id"),
                            F.col(type_col).alias("et"),
                        )
                    )
                ),
                lambda e: e["et"],
            ),
            " ",
        ).alias("content"),
    )
    return msgs.groupBy(user_col, "session_id").agg(
        F.max("__turn").cast("long").alias("n_turns"),
        F.to_json(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("__turn").alias("t"),
                            F.col("role").alias("role"),
                            F.col("content").alias("content"),
                        )
                    )
                ),
                lambda m: F.struct(m["role"].alias("role"), m["content"].alias("content")),
            )
        ).alias("messages_json"),
    )


def disorder_audit(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    late_threshold_us: int = 600_000_000,
) -> DataFrame:
    """Event-time disorder audit — the measurement that sizes a
    watermark delay (and Samza's window close timeout:
    samza-core/.../operators/impl/WindowOperatorImpl.java keeps panes
    open exactly as long as late data is still worth admitting).

    Arrival order is ``seq_col`` (the append/offset order of the
    stream); a record's *lateness* is how far the stream's event-time
    high-water mark had already advanced past it on arrival:
    ``max(ts) over arrival-so-far  -  ts``. Per key the audit emits the
    event count, out-of-order count, maximum and exact p95 lateness
    (order statistic by rank — no approximate percentile), and the
    ppm of records later than ``late_threshold_us`` (what a watermark
    of that delay would drop).

    Scale: ONE shuffle on the stream key; both windows (running max,
    lateness rank) ride the same partitioning, and per-key sequential
    scan is exactly how a per-SSP audit would run in the reference.
    All-integer output (epoch µs), oracle-exact.
    """
    ts_us = F.unix_micros(F.col(ts_col))
    w_run = (
        Window.partitionBy(key_col)
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    late = df.select(
        F.col(key_col).alias("key"),
        (F.max(ts_us).over(w_run) - ts_us).alias("late_us"),
    )
    w_rank = Window.partitionBy("key").orderBy("late_us")
    ranked = late.select(
        "key", "late_us", F.row_number().over(w_rank).alias("rn")
    )
    per_key = ranked.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("late_us") > 0).cast("long")).alias("n_out_of_order"),
        F.max("late_us").alias("max_late_us"),
        F.sum((F.col("late_us") > late_threshold_us).cast("long")).alias("n_beyond"),
    )
    # exact p95: the ceil(0.95 * n)-th smallest lateness
    p95 = (
        ranked.join(
            per_key.select("key", "n_events"), "key"
        )
        .where(F.expr("rn = greatest(1, (19 * n_events + 19) div 20)"))
        .select("key", F.col("late_us").alias("p95_late_us"))
    )
    return (
        per_key.join(p95, "key")
        .select(
            "key",
            "n_events",
            "n_out_of_order",
            "max_late_us",
            "p95_late_us",
            F.expr("(n_beyond * 1000000) div n_events").alias("dropped_ppm"),
        )
    )


def kaplan_meier(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    churn_gap_us: int = 7 * 86_400_000_000,
    bin_us: int = 86_400_000_000,
) -> DataFrame:
    """Kaplan-Meier survival table over per-user activity lifetimes.

    Each user is born at their first event. A user whose last event is
    more than ``churn_gap_us`` before the observation end (the max
    event time in the table) is a churn *event* at their last-seen
    time; everyone else is *censored* at the observation end. Lifetimes
    bucket into units of ``bin_us``. Output is one row per lifetime
    bucket ``t_bin`` with the risk set and the bucket's event/censor
    counts — the product-limit estimator's inputs, all integers (the
    survival curve itself is a cumulative product of rationals, left to
    the consumer so no cross-engine float drift).

    Scale: ONE per-user aggregate (map-side combinable) plus a count
    keyed by lifetime bucket; the bucket-level table is bounded by the
    observation span, so the final risk-set window is a bounded
    single-partition stage (same idiom as the retention grid).
    """
    gap_us = int(churn_gap_us)
    bin_us = int(bin_us)
    per_user = events.groupBy(user_col).agg(
        F.expr(f"min(unix_micros({ts_col}))").alias("birth_us"),
        F.expr(f"max(unix_micros({ts_col}))").alias("last_us"),
    )
    obs = events.agg(F.expr(f"max(unix_micros({ts_col}))").alias("obs_us"))
    lab = per_user.crossJoin(F.broadcast(obs)).select(
        F.expr(
            f"case when last_us < obs_us - {gap_us} "
            f"then (last_us - birth_us) div {bin_us} "
            f"else (obs_us - birth_us) div {bin_us} end"
        ).alias("t_bin"),
        F.expr(
            f"case when last_us < obs_us - {gap_us} then 1 else 0 end"
        ).alias("is_event"),
    )
    agg = lab.groupBy("t_bin").agg(
        F.sum("is_event").alias("d_events"),
        F.sum(F.lit(1) - F.col("is_event")).alias("c_censored"),
    )
    w = Window.orderBy("t_bin").rowsBetween(Window.unboundedPreceding, -1)
    total = lab.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        agg.crossJoin(F.broadcast(total))
        .select(
            "t_bin",
            (
                F.col("n_total")
                - F.coalesce(
                    F.sum(F.col("d_events") + F.col("c_censored")).over(w),
                    F.lit(0),
                )
            ).alias("n_risk"),
            "d_events",
            "c_censored",
        )
        .orderBy("t_bin")
    )


def markov_eval(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
    test_mod: int = 5,
) -> DataFrame:
    """Order-1 Markov next-event predictor with a held-out evaluation:
    train transition counts on a deterministic hash split of users
    (4/5), predict argmax next type, score per-state accuracy on the
    held-out users — the sequence-model baseline every behavioral
    pipeline needs before reaching for anything bigger.

    Plan: per-user lag window (ONE user-keyed shuffle shared by train
    and test), a transition-matrix aggregate bounded by |types|^2, a
    rank over that tiny matrix, and a broadcast join of predictions
    onto held-out transitions. Ties in argmax break to the
    lexicographically smallest type, so the prediction is deterministic.

    Returns ``(prev_type, predicted, n_test, n_correct, acc_ppm)``.
    """
    h = (
        f"cast(conv(substr(md5(concat('mk|', cast({user_col} as string))), "
        "1, 8), 16, 10) as bigint)"
    )
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    trans = events.select(
        user_col,
        F.expr(f"{h} % {test_mod} = 0").alias("is_test"),
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    train = (
        trans.filter(~F.col("is_test"))
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rk = Window.partitionBy("prev_type").orderBy(
        F.col("c").desc(), F.col("next_type")
    )
    pred = (
        train.withColumn("rn", F.row_number().over(rk))
        .filter(F.col("rn") == 1)
        .select("prev_type", F.col("next_type").alias("predicted"))
    )
    test = trans.filter(F.col("is_test"))
    return (
        test.join(F.broadcast(pred), "prev_type")
        .groupBy("prev_type", "predicted")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                (F.col("next_type") == F.col("predicted")).cast("long")
            ).alias("n_correct"),
        )
        .select(
            "prev_type",
            "predicted",
            "n_test",
            "n_correct",
            F.expr("(n_correct * 1000000) div n_test").alias("acc_ppm"),
        )
    )


def fifo_allocation(
    demand: DataFrame,
    stock: DataFrame,
    key_col: str,
    qty_col: str,
    stock_col: str,
    order_cols: "list[str]",
) -> DataFrame:
    """FIFO inventory allocation (supply-chain netting): demand lines
    consume each key's stock in strict arrival order; a line is filled
    with ``clamp(stock - demand_before_it, 0, qty)`` — pure per-key
    cumulative-sum arithmetic, no sequential loop, no iterative state.

    Returns the demand rows plus ``filled_qty`` / ``short_qty``.
    Scale: ONE cumsum window per key partition; keys are independent.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    joined = demand.join(stock.select(key_col, stock_col), key_col)
    return (
        joined.withColumn(
            "__before", F.coalesce(F.sum(qty_col).over(w), F.lit(0))
        )
        .withColumn(
            "filled_qty",
            F.greatest(
                F.lit(0),
                F.least(
                    F.col(qty_col), F.col(stock_col) - F.col("__before")
                ),
            ).cast("long"),
        )
        .withColumn(
            "short_qty", (F.col(qty_col) - F.col("filled_qty")).cast("long")
        )
        .drop("__before")
    )


def interval_merge(
    intervals: DataFrame,
    key_col: str = "key",
    start_col: str = "start_us",
    end_col: str = "end_us",
) -> DataFrame:
    """Coalesce overlapping (or touching) intervals per key — the
    gaps-and-islands merge every timeline/entitlement/maintenance-window
    pipeline needs: an interval starts a new island iff its start lies
    strictly beyond the running max end of everything before it.

    Plan: per-key sort window (one shuffle on the key), a running-max /
    running-sum pair, and one groupBy — no self-joins, no recursion.
    Returns ``(key, island, merged start/end, n_merged)``.
    """
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(key_col)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = intervals.withColumn(
        "__new",
        (
            F.col(start_col)
            > F.coalesce(F.max(end_col).over(w_prev), F.lit(-(1 << 62)))
        ).cast("long"),
    ).withColumn("island", F.sum("__new").over(w_run))
    return (
        flagged.groupBy(key_col, "island")
        .agg(
            F.min(start_col).cast("long").alias(start_col),
            F.max(end_col).cast("long").alias(end_col),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .orderBy(key_col, "island")
    )


def window_funnel(
    df: DataFrame,
    steps: "list[str]",
    window_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """ClickHouse-style ``windowFunnel``: per user, the longest step
    chain t1 < t2 < ... < tL (each event strictly after the previous
    step's) completed within ``window_us`` of the chain's FIRST event —
    a sliding-window funnel, unlike :func:`funnel` which scans the
    whole history. Greedy earliest-next matching is provably optimal
    (an exchange argument: taking the earliest valid next event never
    shrinks the remaining budget), so the result is deterministic and
    SQL-replayable.

    Plan: ONE groupBy(user) collecting per-step sorted timestamp
    arrays; the chain search is a row-local array expression (bounded
    by the user's own event counts) — no self-joins, no window over
    the corpus. Returns ``(user, level)`` with level 0 when step 1
    never fires.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    arrs = [
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col(type_col) == F.lit(s), F.unix_micros(F.col(ts_col))
                )
            )
        ).alias(f"__a{i}")
        for i, s in enumerate(steps)
    ]
    agged = (
        df.where(F.col(type_col).isin(steps))
        .groupBy(user_col)
        .agg(*arrs)
    )

    def chain_level(s1):
        # NOTE: F.filter dispatches on the lambda's ARITY (a second
        # parameter receives the element index), so the usual
        # default-arg capture trick must not be used here — bind the
        # loop state through a one-argument closure factory instead.
        def step_pred(tp):
            return lambda x: (x > tp) & (x <= s1 + F.lit(window_us))

        level = F.lit(1)
        t_prev = s1
        for k in range(1, len(steps)):
            t_k = F.array_min(F.filter(F.col(f"__a{k}"), step_pred(t_prev)))
            level = level + F.when(t_k.isNotNull(), F.lit(1)).otherwise(F.lit(0))
            t_prev = t_k
        return level

    lvl = F.coalesce(
        F.array_max(F.transform(F.col("__a0"), chain_level)), F.lit(0)
    )
    return agged.select(user_col, lvl.cast("long").alias("level"))


def watermark_plan(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    candidate_delays_us: "tuple[int, ...]" = (
        0,
        60_000_000,
        600_000_000,
        3_600_000_000,
    ),
) -> DataFrame:
    """Watermark-delay tradeoff CURVE — disorder_audit answers "how much
    is late at THIS threshold"; this emits the whole operating table a
    streaming job tunes against: for each candidate delay d, how many
    records per key the watermark would drop (arrived after the
    event-time high-water mark had advanced more than d past them).
    Pick the knee; every extra second of delay is extra state retention
    on every stateful operator downstream.

    Same lateness definition and single key-shuffle as disorder_audit
    (running max over ``seq_col`` arrival order); the candidate list is
    a broadcast literal crossed in map-side. Emits ``(key, delay_us,
    n_events, n_late, late_ppm)`` — all integer."""
    ts_us = F.unix_micros(F.col(ts_col))
    w_run = (
        Window.partitionBy(key_col)
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    late = df.select(
        F.col(key_col).alias("key"),
        (F.max(ts_us).over(w_run) - ts_us).alias("late_us"),
    )
    delays = ", ".join(str(int(d)) + "L" for d in candidate_delays_us)
    tagged = late.select(
        "key",
        "late_us",
        F.explode(F.expr(f"array({delays})")).alias("delay_us"),
    )
    return (
        tagged.groupBy("key", "delay_us")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum((F.col("late_us") > F.col("delay_us")).cast("long"))
            .cast("long")
            .alias("n_late"),
        )
        .withColumn(
            "late_ppm", F.expr("n_late * 1000000 div n_events")
        )
    )


def position_attribution(
    df: DataFrame,
    conversion_type: str = "purchase",
    touch_type: str = "click",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    lookback_us: int = 604_800_000_000,
    first_ppm: int = 400_000,
    last_ppm: int = 400_000,
) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution — last_touch's
    fair sibling: each conversion's credit splits 40/20/40 (configurable
    ppm) across the first touch, the middle touches (evenly), and the
    last touch within the lookback. The multi-touch model every
    ad-spend report wants once last-touch's bias is understood; with
    one touch the whole 1e6 ppm goes to it, with two the middle share
    folds into first+last proportionally (here: added to last, the
    standard U-shape degenerate rule).

    Shape: conversions pair with their prior touches through ONE
    key-partitioned interval join (touch in (conv_ts - lookback,
    conv_ts)), then rank-in-window decides position — both shuffles on
    the key. Integer ppm division with the remainder assigned to the
    LAST touch so every conversion's credit sums to exactly 1e6
    (auditable corpus-wide).

    Emits one row per (conversion, touch): ``(key, conv_id, touch_id,
    position, n_touches, credit_ppm)``.
    """
    us = F.unix_micros(F.col(ts_col))
    conv = df.filter(F.col(type_col) == conversion_type).select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("conv_id"),
        us.alias("conv_us"),
    )
    touch = df.filter(F.col(type_col) == touch_type).select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("touch_id"),
        us.alias("touch_us"),
    )
    paired = conv.join(touch, "key").filter(
        (F.col("touch_us") < F.col("conv_us"))
        & (F.col("touch_us") >= F.col("conv_us") - F.lit(int(lookback_us)))
    )
    w = Window.partitionBy("key", "conv_id").orderBy(
        F.col("touch_us").asc(), F.col("touch_id").asc()
    )
    w_n = Window.partitionBy("key", "conv_id")
    ranked = paired.withColumn("position", F.row_number().over(w)).withColumn(
        "n_touches", F.count(F.lit(1)).over(w_n)
    )
    f, l = int(first_ppm), int(last_ppm)
    mid_total = 1_000_000 - f - l
    # the last touch takes everything not already assigned, so each
    # conversion's credit sums to exactly 1e6 despite integer division
    credit = F.expr(
        f"""case
          when n_touches = 1 then 1000000L
          when position = 1 then {f}L
          when n_touches = 2 then 1000000L - {f}L
          when position < n_touches
            then {mid_total}L div (n_touches - 2)
          else 1000000L - {f}L
               - ({mid_total}L div (n_touches - 2)) * (n_touches - 2)
        end"""
    )
    return ranked.select(
        "key",
        "conv_id",
        "touch_id",
        F.col("position").cast("int").alias("position"),
        F.col("n_touches").cast("long").alias("n_touches"),
        credit.cast("long").alias("credit_ppm"),
    )


def tail_attribution(
    df: DataFrame,
    value_col: str = "value",
    key_col: str = "event_type",
    tail_ppm: int = 990_000,
) -> DataFrame:
    """Tail attribution: WHICH keys own the p99 — latency_percentiles
    says how bad the tail is; this says who to page. The global
    threshold is the exact discrete order statistic at ``tail_ppm``
    (value at sorted position ``ceil(n * q)``, integer-ceil idiom)
    computed through the range-exchange global rank — no
    single-partition sort — then one key aggregate counts each key's
    rows at or above it. Emits ``(key, n_events, n_tail, tail_share_ppm,
    tail_rate_ppm)``: share = of all tail rows, rate = of the key's own
    rows.
    """
    from samza_spark.operators.rank import global_rank

    vals = df.select(
        F.col(key_col).alias("key"),
        F.expr(f"cast(floor({value_col} * 1000) as bigint)").alias("v"),
    )
    total = vals.agg(F.count(F.lit(1)).alias("n_total"))
    ranked = global_rank(
        vals.select("v"), [F.col("v")], rank_col="rn"
    ).crossJoin(F.broadcast(total))
    thr = ranked.filter(
        F.expr(f"rn = (n_total * {int(tail_ppm)}L - 1) div 1000000 + 1")
    ).select(F.col("v").alias("thr"))
    tagged = vals.crossJoin(F.broadcast(thr))
    per_key = tagged.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum((F.col("v") >= F.col("thr")).cast("long"))
        .cast("long")
        .alias("n_tail"),
    )
    tail_total = per_key.agg(
        F.sum("n_tail").cast("long").alias("tail_all")
    )
    return (
        per_key.crossJoin(F.broadcast(tail_total))
        .select(
            "key",
            "n_events",
            "n_tail",
            F.expr(
                "case when tail_all > 0 then n_tail * 1000000 div tail_all "
                "else 0 end"
            ).alias("tail_share_ppm"),
            F.expr("n_tail * 1000000 div n_events").alias("tail_rate_ppm"),
        )
    )


def audience_overlap(
    df: DataFrame,
    key_col: str = "event_type",
    user_col: str = "user_id",
) -> DataFrame:
    """Pairwise audience overlap — for every pair of event types, how
    many distinct users do both (the venn report behind "are clickers
    the same people as purchasers"). Exact distinct-user sets; Jaccard
    in ppm. The (user, key) distinct projection is one aggregate; the
    pair join is user-keyed (bounded by per-user key-set size squared,
    i.e. K^2 per user at most), never a corpus cross join.

    Emits ``(key_a, key_b, n_a, n_b, n_both, jaccard_ppm)`` for
    key_a < key_b."""
    uk = df.select(F.col(user_col).alias("u"), F.col(key_col).alias("k")).distinct()
    sizes = uk.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n"))
    pairs = (
        uk.alias("l")
        .join(uk.alias("r"), "u")
        .filter(F.expr("l.k < r.k"))
        .groupBy(F.expr("l.k").alias("key_a"), F.expr("r.k").alias("key_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    return (
        pairs.join(
            F.broadcast(sizes.withColumnRenamed("k", "key_a").withColumnRenamed("n", "n_a")),
            "key_a",
        )
        .join(
            F.broadcast(sizes.withColumnRenamed("k", "key_b").withColumnRenamed("n", "n_b")),
            "key_b",
        )
        .select(
            "key_a",
            "key_b",
            "n_a",
            "n_b",
            "n_both",
            F.expr(
                "n_both * 1000000 div (n_a + n_b - n_both)"
            ).alias("jaccard_ppm"),
        )
    )


def bitmap_index(
    df: DataFrame,
    set_col: str,
    member_col: str,
    word_bits: int = 32,
) -> DataFrame:
    """Compressed-bitmap audience index (the Druid/ClickHouse/roaring
    trick relationalized): members of each set packed into per-bucket
    bit words — ``bucket = member div word_bits``, bit ``member %
    word_bits`` — via a ``bit_or`` aggregate. 32-bit words keep every
    mask inside the cross-engine-safe range (DuckDB's BIGINT ``<<``
    faults at bit 63; p % 32 never gets there).

    One (set, bucket)-keyed aggregate; the index is |sets| x
    |member-space|/32 rows, and every downstream set operation works on
    words, never raw membership rows.
    """
    return (
        df.select(
            F.col(set_col).alias("s"),
            F.col(member_col).cast("long").alias("__m"),
        )
        .distinct()
        .groupBy(
            "s",
            F.expr(f"__m div {int(word_bits)}").alias("bucket"),
        )
        .agg(
            F.expr(
                f"bit_or(shiftleft(1L, cast(__m % {int(word_bits)} as int)))"
            ).cast("long").alias("word")
        )
    )


def bitmap_pair_counts(bitmaps: DataFrame) -> DataFrame:
    """Exact pairwise set intersection / union / difference
    cardinalities from a :func:`bitmap_index` — the audience-overlap
    matrix WITHOUT re-touching raw membership rows: join the two sets'
    words on bucket, ``bit_count`` the AND/OR/ANDNOT, sum. Each pair's
    work is proportional to the INDEX size (member-space/32 words),
    which is why bitmap indexes beat row joins by ~word_bits x when the
    same sets are intersected repeatedly.

    Emits ``(set_a, set_b, n_a, n_b, n_inter, n_union, n_only_a,
    jaccard_ppm)`` for every unordered set pair with a NON-EMPTY
    intersection (disjoint pairs produce no row — the same contract a
    raw-row intersection join has). Single bucket-keyed equi-join
    (sets-squared x buckets rows — sets are few, buckets bounded by
    member-space/32).
    """
    sizes = bitmaps.groupBy("s").agg(
        F.sum(F.expr("bit_count(word)")).cast("long").alias("n")
    )
    a = bitmaps.select(
        F.col("s").alias("set_a"), "bucket", F.col("word").alias("wa")
    )
    b = bitmaps.select(
        F.col("s").alias("set_b"), "bucket", F.col("word").alias("wb")
    )
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("set_a") < F.col("set_b"))
        .groupBy("set_a", "set_b")
        .agg(
            F.sum(F.expr("bit_count(wa & wb)")).cast("long").alias(
                "n_inter"
            ),
        )
        .filter(F.col("n_inter") > 0)
    )
    return (
        pairs.join(
            sizes.select(F.col("s").alias("set_a"), F.col("n").alias("n_a")),
            "set_a",
        )
        .join(
            sizes.select(F.col("s").alias("set_b"), F.col("n").alias("n_b")),
            "set_b",
        )
        .select(
            "set_a",
            "set_b",
            "n_a",
            "n_b",
            "n_inter",
            (F.col("n_a") + F.col("n_b") - F.col("n_inter")).alias("n_union"),
            (F.col("n_a") - F.col("n_inter")).alias("n_only_a"),
            F.expr(
                "n_inter * 1000000 div (n_a + n_b - n_inter)"
            ).alias("jaccard_ppm"),
        )
    )
