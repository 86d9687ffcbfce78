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


def _positional_grams(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, pos, gram_hash) for every length-``n`` token window of the
    normalized text (1-based ``pos``; docs shorter than n emit none).
    Map-only: explode + slice + md5, no Python."""
    toks = F.filter(
        F.split(normalized(F.coalesce(F.col(text_col), F.lit(""))), " "),
        lambda x: x != "",
    )
    base = df.select(F.col(id_col).alias("__id"), toks.alias("__toks"))
    return base.select(
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


def contaminated_span_stats(
    train_df: DataFrame,
    bench_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Span-level decontamination (Lee et al. ACL'22 §4 applied cross-corpus;
    the GPT-3/C4 recipes drop whole documents — this removes only the
    overlapping spans, keeping the rest of the document).

    A token position of a train document is *contaminated* when some
    length-``n`` token window containing it also occurs verbatim in the
    benchmark corpus. Returns one row per train document:
    ``(id, n_tokens, n_contam_grams, contam_tokens, contam_frac,
    clean_text)`` where ``clean_text`` is the document with contaminated
    positions dropped.

    Scale design (100 TB train, small benchmark): benchmark window hashes
    are distinct + BROADCAST, so the train side joins map-side — the only
    train shuffles are the per-doc re-aggregation (bounded by doc length)
    and none on the gram key at all. For a benchmark too large to
    broadcast, ``broadcast_bench=False`` falls back to a hash join on the
    gram hash. Mirrors substring.duplicate_ngram_stats' coverage algebra so
    the DuckDB oracle replays it bit-for-bit.
    """
    bench = _positional_grams(bench_df, text_col, id_col, n).select("__h").distinct()
    if broadcast_bench:
        bench = F.broadcast(bench)
    grams = _positional_grams(train_df, text_col, id_col, n)
    hits = grams.join(bench, "__h").select("__id", "pos")
    per_doc = hits.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_contam_grams"),
        F.array_sort(
            F.array_distinct(
                F.flatten(F.collect_list(F.expr(f"sequence(pos, pos + {n - 1})")))
            )
        ).alias("__cov"),
    )
    toks = F.filter(
        F.split(normalized(F.coalesce(F.col(text_col), F.lit(""))), " "),
        lambda x: x != "",
    )
    base = train_df.select(F.col(id_col).alias("__id"), toks.alias("__toks"))
    joined = base.join(per_doc, "__id", "left")
    return joined.select(
        F.col("__id").alias(id_col),
        F.size("__toks").cast("long").alias("n_tokens"),
        F.coalesce("n_contam_grams", F.lit(0)).cast("long").alias("n_contam_grams"),
        F.size(F.coalesce(F.col("__cov"), F.expr("array()")))
        .cast("long")
        .alias("contam_tokens"),
        F.when(
            F.size("__toks") > 0,
            F.size(F.coalesce(F.col("__cov"), F.expr("array()"))).cast("double")
            / F.size("__toks"),
        )
        .otherwise(F.lit(0.0))
        .alias("contam_frac"),
        F.array_join(
            F.transform(
                F.expr(
                    "array_except("
                    "if(size(__toks) >= 1, sequence(1, size(__toks)), array()), "
                    "coalesce(__cov, array()))"
                ),
                lambda p: F.element_at("__toks", p),
            ),
            " ",
        ).alias("clean_text"),
    )


def split_leakage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    weights=(("train", 4), ("test", 1)),
    salt: str = "split0",
) -> DataFrame:
    """Cross-split near-duplicate audit: pairs of documents assigned to
    DIFFERENT splits whose n-gram Jaccard is >= ``threshold`` — i.e.
    test-set content leaking into train through near-duplicates, which a
    per-document split assignment cannot see (Lee et al. 2022 §6.2 found
    eval-train overlap in every corpus they deduplicated).

    Scale shape — strictly cheaper than a full dedup pass:

    1. MinHash-LSH banding over the WHOLE corpus (one explode + one
       (band, bucket) shuffle — dedup.minhash_lsh_candidates).
    2. The split of each pair side is recomputed MAP-SIDE from the id
       hash (sampling.assign_split is a pure function of the id), so
       same-split pairs are discarded with a filter before the expensive
       Jaccard verify — no join against a split table, no extra shuffle.
    3. Exact verify (jaccard_verify) touches only surviving cross-split
       candidates.

    Returns (a, b, split_a, split_b, jaccard), a < b.
    """
    from samza_spark.pipeline import dedup as _dedup
    from samza_spark.pipeline.sampling import _hash_bucket

    total = sum(w for _, w in weights)

    def split_of(col: str):
        bucket = _hash_bucket(col, salt, total)
        acc = 0
        conds = []
        for name, w in weights[:-1]:
            acc += w
            conds.append((acc, name))
        expr = F.lit(weights[-1][0])
        for acc_val, name in reversed(conds):
            expr = F.when(bucket < acc_val, F.lit(name)).otherwise(expr)
        return expr

    pairs = _dedup.minhash_lsh_candidates(
        df, text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands
    )
    cross = (
        pairs.withColumn("split_a", split_of("a"))
        .withColumn("split_b", split_of("b"))
        .filter(F.col("split_a") != F.col("split_b"))
    )
    verified = _dedup.jaccard_verify(
        df,
        cross.select("a", "b"),
        text_col=text_col,
        id_col=id_col,
        threshold=threshold,
        shingle_k=3,
        shingle_mode="word",
    )
    # splits are a pure function of the id: recompute them map-side on the
    # verified rows instead of joining `cross` back (that join would put
    # the whole banding subtree on a second plan branch and evaluate the
    # Arrow banding UDF twice)
    return verified.select(
        "a",
        "b",
        split_of("a").alias("split_a"),
        split_of("b").alias("split_b"),
        "jaccard",
    )
