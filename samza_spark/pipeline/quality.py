"""Declarative data-quality constraints — the Deequ-style (Schelter et
al., VLDB'18, public AWS work) verification layer a production pipeline
runs on every ingest batch before letting it near training.

A rule set compiles into ONE aggregation pass over the data (conditional
integer counters + distinct counts), however many rules there are — the
whole report costs a single scan + one tiny shuffle, so it can run on
every 100 TB refresh. Metrics are integer ppm; thresholds make each rule
a pass/fail gate. Batch and foreachBatch-streaming usable.

Rule kinds (all expressible in ANSI SQL for the oracle):

- ``completeness``: fraction of non-null values
- ``uniqueness``: distinct values / rows
- ``in_range``: fraction within [lo, hi] (nulls fail)
- ``matches``: fraction matching a regex (Java/RE2-common subset)
- ``in_set``: fraction within an allowed value set
- ``non_negative``: shorthand range
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def _rule_condition(rule: Mapping) -> "F.Column":
    kind, col = rule["kind"], rule["col"]
    c = F.col(col)
    if kind == "completeness":
        return c.isNotNull()
    if kind == "in_range":
        return c.isNotNull() & (c >= F.lit(rule["lo"])) & (c <= F.lit(rule["hi"]))
    if kind == "non_negative":
        return c.isNotNull() & (c >= F.lit(0))
    if kind == "matches":
        return c.isNotNull() & c.rlike(rule["pattern"])
    if kind == "in_set":
        return c.isNotNull() & c.isin(list(rule["values"]))
    raise ValueError(f"unknown rule kind {kind!r}")


def quality_report(
    df: DataFrame,
    rules: Sequence[Mapping],
    granularity: int = 1_000_000,
) -> DataFrame:
    """Evaluate every rule in ONE aggregation pass. Each rule is a dict
    with ``name``, ``kind``, ``col``, a ``min_ppm`` threshold (metric >=
    threshold passes) and kind-specific params. Returns one row per rule:
    ``(rule, kind, col, metric_ppm, min_ppm, passed)`` in rule order.

    Single-pass shape: conditional counters are map-side-combinable
    sums; ``uniqueness`` adds count(distinct col), which Spark plans as
    the standard two-phase expand — still one scan, no per-rule jobs.
    The one-row aggregate is unpivoted to rule rows with ``stack`` —
    rows-not-columns keeps the report schema fixed as rules evolve.
    """
    g = int(granularity)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(rules):
        if r["kind"] == "uniqueness":
            aggs.append(F.countDistinct(F.col(r["col"])).alias(f"__m{i}"))
        else:
            aggs.append(
                F.sum(_rule_condition(r).cast("long")).alias(f"__m{i}")
            )
    one = df.agg(*aggs)
    stack_args = []
    for i, r in enumerate(rules):
        stack_args.append(
            f"'{r['name']}', '{r['kind']}', '{r['col']}', "
            f"coalesce(__m{i}, 0) * {g} div greatest(__n, 1), "
            f"cast({int(r['min_ppm'])} as bigint)"
        )
    stacked = one.select(
        F.expr(
            f"stack({len(rules)}, "
            + ", ".join(stack_args)
            + ") as (rule, kind, col, metric_ppm, min_ppm)"
        )
    )
    return stacked.select(
        "rule",
        "kind",
        "col",
        "metric_ppm",
        "min_ppm",
        (F.col("metric_ppm") >= F.col("min_ppm")).alias("passed"),
    )


def join_fanout_audit(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Pre-join cardinality audit: per join key, both sides' row counts
    and the exact output-row contribution ``n_left * n_right`` — the
    planning check that catches many-to-many key explosions BEFORE a
    join materializes 10^12 rows (the classic accidental-cross-join
    production incident). Returns the ``top_k`` heaviest keys.

    Both sides reduce to vocab-sized per-key count tables first (two
    combinable aggregates), so the audit join is counts-to-counts —
    never row-to-row; the top-k is TakeOrderedAndProject. Cost is two
    scans + two count shuffles regardless of fanout.
    """
    lc = left.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("n_left")
    )
    rc = right.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("n_right")
    )
    return (
        lc.join(rc, on="k", how="outer")
        .select(
            F.col("k").alias(key_col),
            F.coalesce("n_left", F.lit(0)).alias("n_left"),
            F.coalesce("n_right", F.lit(0)).alias("n_right"),
            (
                F.coalesce("n_left", F.lit(0)) * F.coalesce("n_right", F.lit(0))
            ).alias("out_rows"),
        )
        .orderBy(F.desc("out_rows"), F.asc(key_col))
        .limit(int(top_k))
    )


# log10(1 + 1/d) in exact ppm, d = 1..9 — the Benford first-digit law.
# Integer constants so both engines compare identical literals.
BENFORD_PPM = (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757)


def benford_audit(
    df: DataFrame,
    value_col: str = "value",
    scale: int = 1_000_000,
) -> DataFrame:
    """Benford's-law first-digit audit over a positive numeric column —
    the fraud/fabrication screen (naturally occurring multi-scale values
    follow P(d) = log10(1 + 1/d); fabricated or truncated data doesn't).
    Emits per digit: observed count, observed share in exact ppm, the
    Benford expectation in ppm (integer constants), and the signed
    delta.

    Exactness: values fixed-point to ``scale`` micro-units; the first
    significant digit is pure integer arithmetic —
    ``x div 10^(len(x) - 1)`` on the BIGINT — no log10 anywhere near the
    data. One combinable 9-bucket aggregate; the shares divide by a
    broadcast scalar total. Engine-exact, one scan.
    """
    x = F.round(F.col(value_col) * F.lit(int(scale))).cast("long")
    digits = (
        df.select(x.alias("x"))
        .filter(F.col("x") > 0)
        .select(
            # pow(10, e) is double but exact for e <= 15; µ-scaled BIGINTs
            # stay far below 10^15 digits of headroom
            F.expr("x div cast(pow(10, length(cast(x as string)) - 1) as long)")
            .cast("int")
            .alias("digit")
        )
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__t"))
    expect = df.sparkSession.createDataFrame(
        [(d + 1, p) for d, p in enumerate(BENFORD_PPM)],
        "digit int, expected_ppm long",
    )
    return (
        counts.join(F.broadcast(total))
        .join(F.broadcast(expect), on="digit")
        .select(
            "digit",
            "n",
            F.expr("(n * 1000000) div __t").alias("obs_ppm"),
            "expected_ppm",
            (F.expr("(n * 1000000) div __t") - F.col("expected_ppm")).alias(
                "delta_ppm"
            ),
        )
    )


def fd_audit(
    df: DataFrame,
    lhs_cols: "Sequence[str]",
    rhs_col: str,
    fd_name: str | None = None,
) -> DataFrame:
    """Functional-dependency audit: does the LHS column set determine
    ``rhs_col``? One row summarizing how many LHS keys exist, how many
    map to MORE than one RHS value (FD violations), the worst key's
    variant count, and the violation rate in exact ppm. The schema-
    discovery/data-contract check (Deequ's uniqueness/consistency family)
    run before declaring a column a reliable join or dedup key.

    Two combinable aggregates: distinct (LHS, RHS) reduction, then the
    per-LHS variant count, then a one-row summary. Shuffle volume is the
    distinct pair table — never raw rows twice.
    """
    name = fd_name or f"{','.join(lhs_cols)}->{rhs_col}"
    pairs = df.select(*lhs_cols, rhs_col).distinct()
    per_key = pairs.groupBy(*lhs_cols).agg(
        F.count(F.lit(1)).alias("variants")
    )
    return per_key.agg(
        F.lit(name).alias("fd"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum((F.col("variants") > 1).cast("long")).alias("n_violating"),
        F.max("variants").alias("max_variants"),
    ).select(
        "fd",
        "n_keys",
        "n_violating",
        "max_variants",
        F.expr("(n_violating * 1000000) div n_keys").alias("violation_ppm"),
    )


def table_profile(
    df: DataFrame,
    cols: "Sequence[str] | None" = None,
) -> DataFrame:
    """One-pass column profiler: for every column, row count, null
    count, exact distinct count, and lexicographic min/max (values cast
    to string so the report schema is fixed across column types — note
    numeric min/max are therefore LEXICOGRAPHIC; exact numeric extremes
    belong to a typed query). The Deequ-profiler analog that feeds rule
    authoring for :func:`quality_report`.

    All metrics for all columns compute in ONE aggregation pass
    (conditional counters + count-distincts planned as the standard
    expand); the unpivot to per-column rows costs nothing. One scan at
    any table width.
    """
    cols = list(cols or df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn{i}"),
            F.countDistinct(F.col(c)).alias(f"__nd{i}"),
            F.min(s).alias(f"__mn{i}"),
            F.max(s).alias(f"__mx{i}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n, coalesce(__nn{i}, 0), coalesce(__nd{i}, 0), "
        f"__mn{i}, __mx{i}"
        for i, c in enumerate(cols)
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col, n_rows, n_null, n_distinct, min_str, max_str)"
        )
    )


def revenue_reconciliation(
    orders: DataFrame,
    lineitem: DataFrame,
    top_k: int = 20,
) -> DataFrame:
    """Financial reconciliation audit: recompute each order's total from
    its line items in EXACT integer arithmetic —
    ``cents × (100 - disc_pct) × (100 + tax_pct)`` per line, summed —
    and report the ``top_k`` orders by absolute mismatch against the
    order header's total (scaled to the same 10⁻⁶-currency unit). The
    sum-consistency check every billing pipeline runs; float summation
    would manufacture phantom mismatches at the ulp level, so everything
    is BIGINT until the final comparison.

    One combinable per-order aggregate over lineitem + a key equi-join
    to the header + TakeOrderedAndProject. Scale-safe.
    """
    line_val = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
        * (F.lit(100) + F.round(F.col("l_tax") * 100).cast("long"))
    )
    computed = lineitem.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.sum(line_val).alias("computed_u"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    header = orders.select(
        "o_orderkey",
        (F.round(F.col("o_totalprice") * 100).cast("long") * F.lit(10000)).alias(
            "header_u"
        ),
    )
    return (
        header.join(computed, on="o_orderkey", how="left")
        .select(
            "o_orderkey",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            "header_u",
            F.coalesce("computed_u", F.lit(0)).alias("computed_u"),
            (
                F.coalesce("computed_u", F.lit(0)) - F.col("header_u")
            ).alias("delta_u"),
        )
        .orderBy(F.desc(F.abs(F.col("delta_u"))), F.asc("o_orderkey"))
        .limit(int(top_k))
    )


def encoding_profile(
    df: DataFrame,
    cols: "list[str]",
    order_col: str,
    rows_per_block: int = 1000,
) -> DataFrame:
    """Storage-encoding advisor: per column, how dictionary- and
    run-length-friendly the values are in *file order* — the statistics
    a writer needs to pick parquet encodings (PLAIN vs RLE_DICTIONARY)
    and that ``zorder_layout`` complements for multi-column pruning.

    Runs are counted within storage blocks of ``rows_per_block``
    consecutive ``order_col`` values (the row-group analog): a block
    boundary resets the run, exactly as a parquet page would. Emits per
    column: rows, distinct values, runs, average run length (×1000,
    integer), and two advisor booleans (``dict_friendly``: distinct ≤
    10% of rows; ``rle_friendly``: runs ≤ 50% of rows).

    Scale: values unpivot to (column, block, order, value) ONCE
    (map-only stack), the run-detection window is partitioned by
    (column, block) — thousands of independent partitions, never a
    global sort — and the rollup is one aggregate with map-side
    partials.
    """
    n_c = len(cols)
    stack_args = ", ".join(f"'{c}', cast({c} as string)" for c in cols)
    long_df = df.select(
        F.col(order_col).alias("ord"),
        F.expr(f"{order_col} div {rows_per_block}").alias("block"),
        F.expr(f"stack({n_c}, {stack_args}) as (col_name, val)"),
    )
    w = Window.partitionBy("col_name", "block").orderBy("ord")
    # run starts at the block's first row or on a null-safe value change
    # (lag-is-null alone would miscount when the previous VALUE is null)
    runs = long_df.select(
        "col_name",
        "val",
        (
            (F.row_number().over(w) == 1)
            | ~F.col("val").eqNullSafe(F.lag("val").over(w))
        )
        .cast("long")
        .alias("run_start"),
    )
    return (
        runs.groupBy("col_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("val").alias("n_distinct"),
            F.sum("run_start").alias("n_runs"),
        )
        .select(
            "col_name",
            "n_rows",
            "n_distinct",
            "n_runs",
            F.expr("(n_rows * 1000) div n_runs").alias("avg_run_len_x1000"),
            F.expr("n_distinct * 10 <= n_rows").alias("dict_friendly"),
            F.expr("n_runs * 2 <= n_rows").alias("rle_friendly"),
        )
    )


def zone_map_stats(
    df: DataFrame,
    value_col: str,
    order_col: str,
    probe_lo,
    probe_hi,
    rows_per_block: int = 1000,
) -> DataFrame:
    """Zone-map (block min/max) effectiveness report — the data-skipping
    statistics a columnar layout keeps per row group, and the
    measurement behind "should this table be Z-ordered/sorted on this
    column": per storage block of ``rows_per_block`` consecutive
    ``order_col`` rows, the min/max of ``value_col``; a probe range
    ``[probe_lo, probe_hi]`` can SKIP every block whose zone does not
    intersect it. Emits one row: block count, skippable blocks for the
    probe, the skip ratio in exact ppm, and the mean block "span share"
    (avg (max-min) as ppm of the global range — wide spans mean the
    column is shuffled relative to file order and zone maps are useless;
    ``zorder_layout`` is the fix).

    ONE aggregate to block zones (map-side combinable), one constant-size
    rollup. All-integer ppm output.
    """
    blocks = (
        df.select(
            F.expr(f"{order_col} div {rows_per_block}").alias("block"),
            F.col(value_col).alias("v"),
        )
        .groupBy("block")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    )
    return blocks.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(
            ((F.col("hi") < F.lit(probe_lo)) | (F.col("lo") > F.lit(probe_hi)))
            .cast("long")
        ).alias("n_skippable"),
        F.min("lo").alias("global_lo"),
        F.max("hi").alias("global_hi"),
        F.sum(F.col("hi") - F.col("lo")).alias("span_sum"),
    ).select(
        "n_blocks",
        "n_skippable",
        F.expr("(n_skippable * 1000000) div n_blocks").alias("skip_ppm"),
        F.expr(
            "cast(case when global_hi > global_lo then "
            "(span_sum * 1000000) / (cast(n_blocks as double) * (global_hi - global_lo)) "
            "else 0.0 end as bigint)"
        ).alias("avg_span_share_ppm"),
    )


def streaming_quality_gate(
    stream_df: DataFrame,
    rules: Sequence[Mapping],
    good_path: str,
    quarantine_path: str,
    report_path: "str | None" = None,
    checkpoint_dir: "str | None" = None,
):
    """Per-trigger data-contract gate on a stream: every micro-batch is
    split ROW-WISE by the conjunction of row-level rules — passing rows
    append to ``good_path``, failing rows append to ``quarantine_path``
    WITH a ``__violated`` column naming the broken rules (the quarantine
    pattern: bad data is parked and attributable, never dropped or
    allowed to poison downstream state). Optionally appends one
    quality_report row-set per trigger to ``report_path`` (batch id +
    per-rule ppm) — the contract's audit trail over time.

    Row-level kinds only (completeness / in_range / in_set / matches /
    non_negative); ``uniqueness`` is corpus-level, not row-decidable —
    rejected here, use dedup/exact on the good stream instead.

    Scale: the split is two filtered appends of the SAME batch scan (no
    shuffle); the report aggregate is one combinable pass per trigger.
    """
    for r in rules:
        if r["kind"] == "uniqueness":
            raise ValueError(
                "uniqueness is not row-decidable; gate rows with row-level "
                "kinds and deduplicate the good stream downstream"
            )

    conds = [(r["name"], _rule_condition(r)) for r in rules]

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        flagged = batch_df.withColumn(
            "__violated",
            F.array_compact(
                F.array(
                    *[
                        F.when(~c, F.lit(name)).otherwise(F.lit(None))
                        for name, c in conds
                    ]
                )
            ),
        )
        flagged.filter(F.size("__violated") == 0).drop("__violated").write.mode(
            "append"
        ).parquet(good_path)
        flagged.filter(F.size("__violated") > 0).withColumn(
            "__violated", F.array_join("__violated", ",")
        ).write.mode("append").parquet(quarantine_path)
        if report_path:
            quality_report(batch_df, rules).withColumn(
                "batch_id", F.lit(int(batch_id))
            ).write.mode("append").parquet(report_path)

    writer = stream_df.writeStream.foreachBatch(gate).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
