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


# ---------------------------------------------------------------------------
# incremental JOIN-view maintenance (weighted multiset / Z-set delta rules)
# ---------------------------------------------------------------------------
#
# Aggregate views merge partial states (above); JOIN views maintain with
# the bilinear delta rule over WEIGHTED multisets (the DBSP / classic
# incremental-view-maintenance algebra, public literature):
#
#     Δ(A ⋈ B) = ΔA ⋈ B_new  +  A_old ⋈ ΔB
#
# where every relation carries an integer multiplicity column ``__w``
# (+1 insert, -1 delete) and a join multiplies weights. The view refresh
# cost is delta-sized: both terms join a DELTA against a base — never
# base ⋈ base — so at 100 TB each refresh is two broadcast-delta joins,
# and a GDPR-style deletion is just a -1 row flowing the same path.


def with_weight(df: DataFrame, weight: int = 1) -> DataFrame:
    """Tag a relation with multiplicity ``__w`` (+1 inserts, -1 deletes)."""
    return df.withColumn("__w", F.lit(int(weight)).cast("long"))


def compact(df: DataFrame) -> DataFrame:
    """Normalize a weighted multiset: sum multiplicities per distinct
    row, drop zeros. This is the only view-sized shuffle in the module —
    production keeps the view bucketed by its join key so the exchange
    vanishes, or defers compaction and folds weights at read time (the
    changelog-compaction trade, tables/local.py)."""
    cols = [c for c in df.columns if c != "__w"]
    return (
        df.groupBy(*cols)
        .agg(F.sum("__w").alias("__w"))
        .filter(F.col("__w") != 0)
    )


def weighted_join(a: DataFrame, b: DataFrame, on) -> DataFrame:
    """Equi-join of weighted relations; output weight = wa * wb."""
    wa = a.withColumnRenamed("__w", "__wa")
    wb = b.withColumnRenamed("__w", "__wb")
    return (
        wa.join(wb, on=on)
        .withColumn("__w", F.col("__wa") * F.col("__wb"))
        .drop("__wa", "__wb")
    )


def join_view_delta(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on,
    *,
    broadcast_deltas: bool = True,
) -> DataFrame:
    """The join-view delta ΔV = ΔA ⋈ B_new + A_old ⋈ ΔB (all weighted).
    Inserts AND deletes ride the same rule: a -1 in ΔB cancels the
    matching V rows and suppresses future ΔA matches (B_new is compacted
    first, so a fully-deleted key contributes nothing). With
    ``broadcast_deltas`` the two base-side joins hint the delta side —
    the physical shape that keeps refresh cost O(|Δ|) at any base size."""
    hint = F.broadcast if broadcast_deltas else (lambda d: d)
    b_new = compact(b_old.unionByName(delta_b))
    t1 = weighted_join(hint(delta_a), b_new, on)
    t2 = weighted_join(a_old, hint(delta_b), on)
    return t1.unionByName(t2.select(*t1.columns))


def apply_delta(view_old: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold ΔV into the view (union + compact). The oracle-checked
    invariant: apply_delta(A_old ⋈ B_old, join_view_delta(...)) ==
    A_new ⋈ B_new computed from scratch."""
    return compact(view_old.unionByName(delta.select(*view_old.columns)))


def streaming_join_view(
    cdc_stream: DataFrame,
    dim: DataFrame,
    on,
    view_path: str,
    *,
    op_col: str = "op",
    checkpoint_dir: "str | None" = None,
):
    """CDC stream -> incrementally maintained join view. Each micro-batch
    of change rows (``op_col`` 'd' = delete, anything else = insert)
    becomes a weighted delta, joins the broadcast dim via the bilinear
    rule (static dim => ΔV = ΔA ⋈ B), and APPENDS to the view's weighted
    delta log — per-trigger cost O(|batch|), no view rewrite, exactly
    the changelog discipline of tables/local.py. Readers compact
    multiplicities on read (:func:`read_join_view`); a periodic
    compaction job can fold the log the same way offline.

    The invariant (tested across restart boundaries): read_join_view
    after any number of triggers == the from-scratch join of the
    SURVIVING change rows with the dim."""
    dim_w = with_weight(dim)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        delta_a = batch_df.withColumn(
            "__w",
            F.when(F.col(op_col) == "d", F.lit(-1))
            .otherwise(F.lit(1))
            .cast("long"),
        ).drop(op_col)
        dv = weighted_join(F.broadcast(delta_a), dim_w, on)
        dv.write.mode("append").parquet(view_path)

    writer = cdc_stream.writeStream.foreachBatch(fold).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def read_join_view(spark, view_path: str) -> DataFrame:
    """Compacted read of a streaming join view's weighted delta log."""
    return compact(spark.read.parquet(view_path))
