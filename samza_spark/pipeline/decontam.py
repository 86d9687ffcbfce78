"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The public recipe (GPT-3 appendix C, Brown et al. 2020; Dodge et al. 2021
for C4) marks a training document contaminated when any of its word
n-grams (typically 8-13 grams; configurable here) also occurs in a held-out
benchmark. The reference engine (apache/samza) has no such operator — this
belongs to the training-data-pipeline surface layered on the stream-table
join shape (high-level API joins, samza-api StreamTableJoinFunction).

Scale design (100 TB train corpus, small benchmark):
- The benchmark n-gram set is built once, deduped, and BROADCAST — the
  train side never shuffles for the join.
- Train documents explode to distinct per-doc n-grams (map-only), semi-ish
  join against the broadcast set, then ONE aggregation keyed by doc id to
  count matches. Documents with zero overlap are restored by a left join
  against the (already partitioned) input keys.
- For benchmark sets too big to broadcast, pass broadcast_bench=False to
  fall back to a shuffle hash join on the gram key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from samza_spark.pipeline.text import normalized


def word_ngram_set(text_col: Column, n: int) -> Column:
    """Distinct word n-grams of the normalized text, as an array<string>.
    Documents shorter than n words contribute their full text as the one
    gram (same clamping as dedup.word_ngrams)."""
    toks = F.split(normalized(text_col), " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    )
    grams = F.transform(starts, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.array_distinct(grams)


def benchmark_grams(
    bench_df: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct n-grams of the benchmark corpus: one column ``gram``."""
    return (
        bench_df.select(
            F.explode(word_ngram_set(F.col(text_col), n)).alias("gram")
        )
        .distinct()
    )


def contamination(
    train_df: DataFrame,
    bench_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-train-document contamination report: (id, n_grams, n_overlap,
    contaminated). ``n_grams`` is the distinct-gram count of the document,
    ``n_overlap`` how many of those occur anywhere in the benchmark."""
    bench = benchmark_grams(bench_df, text_col, n)
    if broadcast_bench:
        bench = F.broadcast(bench)

    train_grams = train_df.select(
        id_col, F.explode(word_ngram_set(F.col(text_col), n)).alias("gram")
    )
    overlaps = (
        train_grams.join(bench, on="gram", how="inner")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    totals = train_df.select(
        id_col, F.size(word_ngram_set(F.col(text_col), n)).alias("n_grams")
    )
    return totals.join(overlaps, on=id_col, how="left").select(
        id_col,
        F.col("n_grams").cast("int").alias("n_grams"),
        F.coalesce("n_overlap", F.lit(0)).cast("int").alias("n_overlap"),
        (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
    )


def decontaminate(
    train_df: DataFrame,
    bench_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    max_overlap: int = 0,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Drop train documents with more than ``max_overlap`` benchmark-gram
    hits; returns the surviving rows of ``train_df`` unchanged."""
    flags = contamination(
        train_df, bench_df, text_col, id_col, n, broadcast_bench
    )
    keep = flags.where(F.col("n_overlap") <= max_overlap).select(id_col)
    return train_df.join(keep, on=id_col, how="left_semi")
