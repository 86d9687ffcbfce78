"""Exact duplicate-substring detection and removal over document tables.

The public technique (Lee et al., "Deduplicating Training Data Makes
Language Models Better", ACL 2022) removes any length-n token span that
occurs more than once across the corpus. A suffix array is the
single-node tool; the distributed re-expression is the classic n-gram
inversion — explode every length-n token window, hash it, count
occurrences globally, and mark the token positions covered by any
duplicated window. That is exactly a groupBy on the gram hash: one
shuffle partitioned by gram, which is the scalable shape (the 100 TB
version is the same plan with more partitions; no per-doc state, no
driver materialization, no cross-doc comparisons outside the hash agg).

Everything here is pure ``pyspark.sql.functions`` (JVM-side, codegen);
the gram hash is md5 so a DuckDB oracle replays every decision
bit-for-bit (see ``__spark_entry__.oracle_sql()['dup_spans']``).

Reference anchor: near-dup/exact-dup is the capability Samza pipelines
build from its KV-store + partitionBy primitives (e.g.
samza-api/.../operators/MessageStream.java:50 partitionBy + aggregate);
this module states the corpus-level batch form Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from samza_spark.pipeline.text import normalized


def _tokens(text_col: str):
    """Whitespace tokens of the normalized text, empty-safe."""
    t = normalized(F.coalesce(F.col(text_col), F.lit("")))
    return F.filter(F.split(t, " "), lambda x: x != "")


def duplicate_ngram_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Per-document duplicate-span profile + span-removed text.

    A length-``n`` token window is *duplicated* when its md5 occurs
    ``min_count``+ times anywhere in the corpus (including within one
    document — the Lee et al. definition). A token position is *covered*
    when at least one duplicated window contains it; covered tokens are
    dropped from ``clean_text`` (span removal, not whole-doc removal).

    Returns one row per input document:
    ``(doc_id, n_tokens, n_dup_grams, dup_tokens, dup_frac, clean_text)``.

    Plan shape: tokens explode to ~n_tokens rows/doc; ONE gram-hash
    groupBy (map-side partial count) finds duplicated grams; the
    occurrence join is hash-partitioned on the same key; the per-doc
    re-aggregation is bounded by document length. No collect, no
    cartesian — survives a 1000-executor scale-up as-is.
    """
    base = df.select(F.col(id_col).alias("__id"), _tokens(text_col).alias("__toks"))
    # position list 1..len-n+1 (guard: Spark sequence(1, 0) DESCENDS — gate on size)
    grams = base.select(
        "__id",
        F.explode(
            F.when(
                F.size("__toks") >= n,
                F.expr(f"sequence(1, size(__toks) - {n - 1})"),
            ).otherwise(F.expr("array()"))
        ).alias("pos"),
        F.col("__toks").alias("__t2"),
    ).select(
        "__id",
        "pos",
        F.md5(F.expr(f"array_join(slice(__t2, pos, {n}), ' ')")).alias("__h"),
    )
    dup = (
        grams.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__occ"))
        .filter(F.col("__occ") >= min_count)
        .select("__h")
    )
    dup_occ = grams.join(dup, "__h").select("__id", "pos")
    per_doc = dup_occ.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_dup_grams"),
        F.array_sort(
            F.array_distinct(
                F.flatten(F.collect_list(F.expr(f"sequence(pos, pos + {n - 1})")))
            )
        ).alias("__cov"),
    )
    joined = base.join(per_doc, "__id", "left").select(
        "__id",
        F.size("__toks").cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_dup_grams"), F.lit(0)).cast("long").alias("n_dup_grams"),
        F.coalesce(F.col("__cov"), F.expr("array()")).alias("__cov"),
        F.col("__toks"),
    )
    return joined.select(
        F.col("__id").alias(id_col),
        "n_tokens",
        "n_dup_grams",
        F.size("__cov").cast("long").alias("dup_tokens"),
        F.when(
            F.col("n_tokens") > 0,
            F.size("__cov").cast("double") / F.col("n_tokens"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
        # keep-positions = all positions EXCEPT covered ones: array_except
        # is hash-based (O(n_tokens + n_covered) per doc, order-preserving)
        # — a per-token array_contains scan would be quadratic on a long,
        # heavily-duplicated document
        F.array_join(
            F.transform(
                F.expr(
                    "array_except("
                    "if(size(__toks) >= 1, sequence(1, size(__toks)), array()), __cov)"
                ),
                lambda p: F.element_at("__toks", p),
            ),
            " ",
        ).alias("clean_text"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_count: int = 2,
    max_dup_frac: float = 1.0,
) -> DataFrame:
    """Span-removal materialization: original columns with ``text``
    replaced by the span-cleaned text; documents whose duplicate-token
    fraction exceeds ``max_dup_frac`` are dropped entirely (boilerplate
    pages that are *mostly* duplicated spans aren't worth keeping as
    fragments). One extra id-keyed join over :func:`duplicate_ngram_stats`.
    """
    stats = duplicate_ngram_stats(df, text_col, id_col, n, min_count)
    keep = stats.filter(F.col("dup_frac") <= max_dup_frac).select(
        id_col, "clean_text", "dup_frac"
    )
    others = [c for c in df.columns if c != text_col]
    return (
        df.join(keep, id_col)
        .select(*others, F.col("clean_text").alias(text_col), "dup_frac")
    )
