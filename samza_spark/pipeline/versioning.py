"""Corpus snapshot diffing: what changed between two versions of a
dataset.

Training-data pipelines re-crawl/re-ingest sources continuously; before
retraining you want the delta — which documents appeared, vanished, or
changed content — both to audit the refresh and to process ONLY the
changed slice downstream (incremental dedup, re-embedding, re-scoring).

Spark-first shape: fingerprint each side map-side (md5 of the compared
columns — cross-engine reproducible), then ONE full-outer sort-merge
join on the id. Shuffle volume is 2 × (id, 16-byte fp) — the document
bodies never move. At 100 TB, snapshot both sides bucketed by the id
column and the exchange disappears entirely (see tables/bucketed.py);
the diff then runs at scan speed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def _fingerprint(cmp_cols: Sequence[str]):
    # md5 over a \x1e-separated concat: reproducible in DuckDB/any engine,
    # separator keeps ("ab","c") != ("a","bc")
    return F.md5(F.concat_ws("\x1e", *[F.col(c).cast("string") for c in cmp_cols]))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    cmp_cols: Sequence[str] = ("text",),
) -> DataFrame:
    """Row-level diff of two snapshots keyed by ``id_col``.

    Returns (id_col, status, old_fp, new_fp) with status one of
    ``added`` (only in new), ``removed`` (only in old), ``changed``
    (both, fingerprints differ), ``unchanged``.
    """
    fp = _fingerprint(cmp_cols)
    o = old.select(F.col(id_col), fp.alias("old_fp"))
    n = new.select(F.col(id_col), fp.alias("new_fp"))
    return o.join(n, on=id_col, how="full_outer").select(
        id_col,
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        "old_fp",
        "new_fp",
    )


def snapshot_diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n) census of a :func:`snapshot_diff` result."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    id_col: str = "doc_id",
    op_col: str = "op",
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Relational MERGE INTO: apply a CDC batch of inserts/updates/
    deletes (``op_col`` in 'I'/'U'/'D') to a snapshot — the batch form
    of the engine's Durable-table changelog apply (tables/local.py) and
    the op every warehouse sink (Delta/Iceberg MERGE) performs on
    ingest.

    Semantics: per key the LAST change wins (ordered by ``order_cols``,
    e.g. a change sequence number — required when a batch can carry
    multiple ops per key); 'D' removes the row, 'I'/'U' both upsert
    (idempotent under replay, matching UpdateOptions.UPDATE_WITH_DEFAULTS
    semantics). Untouched snapshot rows pass through.

    Plan: one partitioned window over the CHANGE batch only (deltas are
    small relative to the snapshot), one anti hash join keyed on the id
    to drop superseded snapshot rows, one unionByName — the snapshot is
    never sorted or windowed. At 100 TB snapshot/changes bucketed on the
    id makes the anti-join exchange-free.
    """
    from pyspark.sql import Window

    cols = [c for c in snapshot.columns]
    if order_cols:
        w = (
            Window.partitionBy(id_col)
            .orderBy(*[F.desc(c) for c in order_cols])
        )
        last = (
            changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        last = changes
    kept = snapshot.join(
        last.select(id_col).distinct(), on=id_col, how="left_anti"
    )
    upserts = last.filter(F.col(op_col) != F.lit("D")).select(*cols)
    return kept.unionByName(upserts)


def merkle_manifest(
    df: DataFrame,
    shard_col: str,
    id_col: str = "doc_id",
    cmp_cols: "Sequence[str] | None" = None,
) -> DataFrame:
    """Merkle-style dataset manifest: a per-shard content root (md5 of
    the shard's SORTED row fingerprints concatenated) plus the corpus
    root (md5 of the sorted shard roots) stamped on every row — two
    datasets are byte-identical iff the corpus roots match, and a
    mismatch localizes to the differing shard in one comparison. The
    reproducibility artifact a dataset card pins (the distributed form
    of hashing a directory tree).

    Row fingerprints are the same md5 the snapshot-diff machinery uses;
    each shard's fold sorts only ITS OWN fingerprints (shard-bounded —
    the per-key boundedness contract), and the corpus fold runs over
    the shard-count-sized root table.
    """
    fp_cols = list(cmp_cols) if cmp_cols is not None else [id_col]
    fp = F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in fp_cols]))
    shards = (
        df.select(F.col(shard_col).alias("shard"), fp.alias("__fp"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.md5(
                F.array_join(F.array_sort(F.collect_list("__fp")), "")
            ).alias("shard_root"),
        )
    )
    corpus = shards.agg(
        F.md5(F.array_join(F.array_sort(F.collect_list("shard_root")), "")).alias(
            "corpus_root"
        )
    )
    return shards.join(F.broadcast(corpus)).select(
        "shard", "n_rows", "shard_root", "corpus_root"
    )


def compaction_plan(
    files: DataFrame,
    group_col: str = "source",
    file_col: str = "file_id",
    bytes_col: str = "bytes",
    target_bytes: int = 200_000,
) -> DataFrame:
    """Small-file compaction planner (the OPTIMIZE/bin-packing step of a
    lakehouse table): within each ``group_col`` partition, assign files
    in ``file_col`` order to output bins of roughly ``target_bytes``.

    Bin assignment is the deterministic first-byte rule: a file belongs
    to bin ``(running_start div target)`` where ``running_start`` is the
    byte offset of the file in the group's ordered concatenation — pure
    window arithmetic, no sequential packing loop, so the plan is ONE
    cumulative-sum window per group partition (scale: groups are many
    and independent; no single-partition stage).

    Returns one row per (group, bin): file count, total bytes, and the
    file-id range the bin covers.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = files.select(
        group_col,
        file_col,
        bytes_col,
        (
            F.coalesce(F.sum(bytes_col).over(w), F.lit(0)).cast("bigint")
        ).alias("start_off"),
    ).withColumn("bin", F.expr(f"start_off div {target_bytes}"))
    return (
        binned.groupBy(group_col, "bin")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(bytes_col).cast("bigint").alias("total_bytes"),
            F.min(file_col).alias("first_file"),
            F.max(file_col).alias("last_file"),
        )
        .orderBy(group_col, "bin")
    )
