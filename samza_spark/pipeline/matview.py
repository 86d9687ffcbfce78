"""Incremental materialized-view maintenance for algebraic aggregates.

A 100 TB metrics table is never re-aggregated from scratch on each
refresh: the view keeps per-key PARTIAL STATES (count/sum/min/max —
exactly the combiner states Spark's own map-side partial aggregation
uses), and each new data slice folds in with one state-merge — cost
proportional to the DELTA, not the history. The streaming analog is the
engine's per-key running aggregate (streaming/running_agg.py); this is
the batch/warehouse form, and the same shape the Durable table's
changelog compaction relies on (tables/local.py).

The invariant that makes it safe — merge(state(A), state(B)) ==
state(A ∪ B) for algebraic aggregates — is exactly what the oracle
checks: the incremental query's result must hash-equal a from-scratch
aggregation.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, functions as F

_KINDS = ("count", "sum", "min", "max")


def agg_state(
    df: DataFrame,
    keys: Sequence[str],
    specs: Mapping[str, tuple],
) -> DataFrame:
    """Per-key partial aggregation state. ``specs`` maps state column ->
    ``(kind, value_col)`` with kind in count/sum/min/max (avg derives
    from a sum and a count at finalize time). One map-side-combinable
    aggregate — the same single shuffle a plain GROUP BY pays, but the
    OUTPUT is mergeable."""
    aggs = []
    for out, (kind, col) in specs.items():
        if kind == "count":
            aggs.append(F.count(F.lit(1)).alias(out))
        elif kind == "sum":
            aggs.append(F.sum(F.col(col).cast("long")).alias(out))
        elif kind == "min":
            aggs.append(F.min(F.col(col)).alias(out))
        elif kind == "max":
            aggs.append(F.max(F.col(col)).alias(out))
        else:
            raise ValueError(f"unknown agg kind {kind!r} (one of {_KINDS})")
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_states(
    prev: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    specs: Mapping[str, tuple],
) -> DataFrame:
    """Fold a delta's states into the view: union + one key-keyed
    combine (sum->sum, count->sum, min->min, max->max). Keys present in
    only one side pass through; nothing rescans history. At 100 TB,
    bucket both tables on ``keys`` and even this combine's exchange
    disappears."""
    merged = prev.unionByName(delta, allowMissingColumns=False)
    aggs = []
    for out, (kind, _col) in specs.items():
        if kind in ("count", "sum"):
            aggs.append(F.sum(F.col(out)).alias(out))
        elif kind == "min":
            aggs.append(F.min(F.col(out)).alias(out))
        elif kind == "max":
            aggs.append(F.max(F.col(out)).alias(out))
        else:
            raise ValueError(f"unknown agg kind {kind!r}")
    return merged.groupBy(*keys).agg(*aggs)


def realtime_rollup(
    raw: DataFrame,
    matview: DataFrame,
    keys: Sequence[str],
    specs: Mapping[str, tuple],
    bucket_col: str,
    frontier,
) -> DataFrame:
    """Continuous-aggregate read path (the TimescaleDB real-time
    hypertable rollup shape): buckets strictly before the
    materialization ``frontier`` come from the persisted ``matview``
    partial states; buckets at/after it are aggregated from ``raw`` on
    the fly; one state-merge stitches them into the exact up-to-date
    answer. Query cost = materialized lookups + a scan of only the raw
    TAIL (with ``bucket_col`` as the partition column, partition pruning
    makes that literal).

    Correctness contract: ``matview`` holds only COMPLETE buckets below
    ``frontier`` (the invalidation-threshold semantics) — both sides are
    filtered on the BUCKET value, so a frontier inside a bucket never
    double-counts: that bucket is recomputed wholly from raw.

    The merge invariant (merge(state(head), state(tail)) ==
    state(whole)) is the module's oracle-checked property; the
    hypertable_rollup query checks this composition end-to-end against
    a from-scratch aggregate.
    """
    head = matview.filter(F.col(bucket_col) < F.lit(frontier))
    tail = agg_state(
        raw.filter(F.col(bucket_col) >= F.lit(frontier)), keys, specs
    )
    return merge_agg_states(head, tail, keys, specs)
