"""Task-to-container assignment via rendezvous (highest-random-weight)
hashing.

Reference parity: Samza assigns TaskNames (one per SystemStreamPartition
group) to containers with a TaskNameGrouper —
``GroupByContainerCount.java`` round-robins sorted task names over N
containers and ``GroupByContainerIds.java`` does the same over explicit
container ids (/root/reference samza-core/src/main/java/org/apache/samza/
container/grouper/task/). Round-robin is balanced but UNSTABLE: adding
one container reshuffles nearly every task, losing all host-affinity
state (the problem Samza's ``TaskAssignmentManager`` + locality manager
work around by persisting the previous assignment).

Rendezvous hashing (Thaler & Ravishankar 1996, public) gives the same
uniform balance but MINIMAL movement: each task independently scores all
containers with ``hash(task || container)`` and picks the max, so adding
a container reassigns only ~1/(N+1) of tasks — the property you want at
1,000 containers where every reassignment means state restore from the
changelog. Deterministic md5 scores make the assignment reproducible in
SQL on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def rendezvous_assign(
    tasks: DataFrame,
    n_containers: int,
    task_cols: "tuple[str, ...]" = ("stream", "partition_id"),
    container_prefix: str = "container_",
) -> DataFrame:
    """Assign each task row to one of ``n_containers`` containers by
    highest md5 rendezvous score.

    Scale posture: the container list is a tiny literal array crossed
    into the task table (broadcast nested loop over ``n_containers``
    rows — NOT a shuffle); the argmax is a window PARTITIONED by task
    (never global). The task table itself is small by construction
    (one row per SSP group, like Samza's JobModel).

    Returns the task columns plus ``(container, score)``.
    """
    spark = tasks.sparkSession
    containers = spark.range(n_containers).select(
        F.concat(F.lit(container_prefix), F.col("id").cast("string")).alias(
            "container"
        )
    )
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in task_cols])
    scored = (
        tasks.withColumn("__key", key)
        .join(F.broadcast(containers))
        .withColumn(
            "score",
            F.expr(
                "cast(conv(substring(md5(concat(__key, '|', container)), 1, 13), "
                "16, 10) AS bigint)"
            ),
        )
    )
    w = Window.partitionBy(*task_cols).orderBy(
        F.col("score").desc(), F.col("container").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__key")
    )


def assignment_movement(before: DataFrame, after: DataFrame,
                        task_cols: "tuple[str, ...]" = ("stream", "partition_id")
                        ) -> DataFrame:
    """Audit: fraction of tasks whose container changed between two
    assignments (rendezvous guarantees ~1/(N+1) on adding one container;
    round-robin moves ~(N-1)/N). One equi-join on the task key."""
    b = before.select(*task_cols, F.col("container").alias("c_before"))
    a = after.select(*task_cols, F.col("container").alias("c_after"))
    j = b.join(a, list(task_cols))
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_tasks"),
        F.sum(
            F.when(F.col("c_before") != F.col("c_after"), 1).otherwise(0)
        ).cast("long").alias("n_moved"),
        F.expr(
            "(1000000L * sum(CASE WHEN c_before != c_after THEN 1 ELSE 0 END))"
            " div count(*)"
        ).alias("moved_ppm"),
    )


def rebalance_audit(
    tasks: DataFrame,
    n_old: int,
    n_new: int,
    task_cols: "tuple[str, ...]" = ("stream", "partition_id"),
) -> DataFrame:
    """Scale-out rebalance audit: what fraction of tasks MOVE when the
    container count changes from ``n_old`` to ``n_new`` — rendezvous
    hashing's whole point is that the answer is ~1/n_new, while the
    naive ``partition % n`` placement reshuffles almost everything
    (state restore cost ~ 50 MB/s/store per the reference's own docs,
    so movement fraction IS the scale-out downtime). Emits one row per
    task ``(task cols, old_container, new_container, moved,
    moved_modulo)`` plus the two pooled ppm columns repeated per row.

    Same md5 scoring as rendezvous_assign (replayable in SQL); the
    modulo baseline uses the task's partition id. Both assignments ride
    the same broadcast-scored window — no extra shuffle beyond the
    task-keyed argmax.
    """
    old = rendezvous_assign(
        tasks, n_old, task_cols=task_cols
    ).withColumnRenamed("container", "old_container").drop("score")
    new = rendezvous_assign(
        tasks, n_new, task_cols=task_cols
    ).withColumnRenamed("container", "new_container").drop("score")
    joined = old.join(new, list(task_cols))
    pid = F.col(task_cols[-1])
    tagged = joined.withColumn(
        "moved", F.col("old_container") != F.col("new_container")
    ).withColumn(
        "moved_modulo",
        (pid % F.lit(int(n_old))) != (pid % F.lit(int(n_new))),
    )
    pooled = tagged.agg(
        F.expr(
            "cast(sum(case when moved then 1 else 0 end) * 1000000 "
            "div count(1) as bigint)"
        ).alias("rz_moved_ppm"),
        F.expr(
            "cast(sum(case when moved_modulo then 1 else 0 end) * 1000000 "
            "div count(1) as bigint)"
        ).alias("mod_moved_ppm"),
    )
    return tagged.crossJoin(F.broadcast(pooled))
