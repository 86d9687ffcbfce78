"""Global exact ranking without a single-partition sort.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses the
whole dataset into ONE task — the textbook non-scalable plan (Spark even
warns: "No Partition Defined for Window operation"). The distributed
classic replaces it with range partitioning + per-partition offsets:

1. ``repartitionByRange`` on the order keys (range exchange — Spark
   samples boundaries; every partition holds a contiguous key range),
2. sort within partitions (parallel, no global shuffle),
3. count rows per partition (tiny aggregate), broadcast the cumulative
   offsets,
4. global rank = partition offset + rank within partition (a Window
   PARTITIONED BY the partition id — every partition ranks in parallel).

The result is byte-identical to the single-partition window for any
total order (include a tiebreaker column!), regardless of where the
sampled range boundaries fall — boundaries only decide which partition
computes a row's rank, not the rank itself. A DuckDB oracle can
therefore be the plain ``row_number() OVER (ORDER BY ...)``.

Reference anchor: the reference has no global-sort operator at all (its
jobs are partition-parallel by design, MessageStream.partitionBy); this
is the batch capability a corpus-curation pipeline needs (rank by
quality, take global percentiles) expressed with the same
partition-parallelism constraint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def global_rank(
    df: DataFrame,
    order_by: "list[Column]",
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based global ``rank_col`` ordered by ``order_by`` (a list
    of Column expressions — include a unique tiebreaker for a total
    order, or ranks are nondeterministic for tied rows). No
    single-partition stage anywhere in the plan.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *order_by).sortWithinPartitions(*order_by)
    # pin the range partitioning before reading it twice (offset count +
    # rank join): range boundaries come from sampling, so re-executing the
    # exchange in two jobs could place rows differently. The
    # materialization is the shuffle-file cost any global sort pays.
    with_pid = ranged.withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    # tiny: one row per partition, collected to build cumulative offsets
    sizes = {
        r["__pid"]: r["c"]
        for r in with_pid.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_df = F.broadcast(
        spark.createDataFrame(
            [(p, o) for p, o in offsets.items()], "__pid int, __off long"
        )
    )
    w = Window.partitionBy("__pid").orderBy(*order_by)
    return (
        with_pid.join(off_df, on="__pid")
        .withColumn(rank_col, (F.row_number().over(w) + F.col("__off")).cast("long"))
        .drop("__pid", "__off")
    )


def global_cumsum(
    df: DataFrame,
    order_by: "list[Column]",
    sum_cols: "list[str]",
    prefix: str = "cum_",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global running totals of ``sum_cols`` in ``order_by`` order —
    ``sum(col) OVER (ORDER BY ...)`` without the single-partition window
    that expression plans to. Same shape as :func:`global_rank`: range
    exchange, per-partition window cumsum (parallel), then a broadcast of
    per-partition totals supplies each partition's starting offset. The
    offsets job is one row per partition. Results are byte-identical to
    the global window for any total order (integer inputs assumed — the
    repo's fixed-point convention keeps the sums shuffle-order-free)."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *order_by).sortWithinPartitions(*order_by)
    with_pid = ranged.withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    totals = (
        with_pid.groupBy("__pid")
        .agg(*[F.sum(c).cast("long").alias(c) for c in sum_cols])
        .collect()
    )
    by_pid = {r["__pid"]: r for r in totals}
    offsets, acc = [], {c: 0 for c in sum_cols}
    for pid in sorted(by_pid):
        offsets.append((pid, *[acc[c] for c in sum_cols]))
        for c in sum_cols:
            acc[c] += by_pid[pid][c] or 0
    schema = "__pid int, " + ", ".join(f"__off_{c} long" for c in sum_cols)
    off_df = F.broadcast(df.sparkSession.createDataFrame(offsets, schema))
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = with_pid.join(off_df, on="__pid")
    for c in sum_cols:
        out = out.withColumn(
            prefix + c,
            (F.sum(c).over(w) + F.col(f"__off_{c}")).cast("long"),
        )
    return out.drop("__pid", *[f"__off_{c}" for c in sum_cols])


def with_percentile(
    df: DataFrame,
    order_by: "list[Column]",
    rank_col: str = "rank",
    pct_col: str = "percentile",
    buckets: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global rank plus the percentile bucket ``ceil(rank * buckets /
    n)`` (1..buckets) — the corpus-curation selector ("keep the top
    decile by quality") built on :func:`global_rank`, so the plan stays
    free of single-partition stages. The bucket arithmetic is integer
    (exact in any engine)."""
    ranked = global_rank(df, order_by, rank_col=rank_col, num_partitions=num_partitions)
    n = ranked.count()
    return ranked.withColumn(
        pct_col,
        F.ceil(F.col(rank_col) * F.lit(buckets) / F.lit(max(n, 1))).cast("int"),
    )
