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
