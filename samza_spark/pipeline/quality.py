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

from pyspark.sql import DataFrame, functions as F


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
