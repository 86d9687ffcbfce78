"""Corpus-level boilerplate removal (CCNet/C4-style segment dedup).

The public recipe (CCNet: Wenzek et al. 2019; C4: Raffel et al. 2019)
removes text units that recur across many documents — navigation chrome,
license banners, cookie notices — before training. The unit is normally a
line or paragraph; this module segments generically (newline split when the
corpus has newlines, fixed word windows otherwise) so the same plan shape
covers both.

Reference anchor: apache/samza has no corpus-level text operator — this is
part of the training-data-pipeline surface built on top of the engine
(stream-table join + windowed aggregation shapes, cf.
docs/learn/documentation/versioned/api/high-level-api.md).

Scale design (100 TB):
- Segmentation is map-only (posexplode of an array expression; no Python).
- Document frequency is ONE shuffle on the segment key with map-side
  partial aggregation: distinct (segment, doc) pairs are pre-deduped by
  the partial agg, so a segment repeated inside one document contributes 1.
- The frequent-segment set (df >= min_df) is tiny by construction (heavy
  hitters only) and is BROADCAST to the anti-join — the corpus-side
  segments never shuffle a second time.
- Reassembly groups by doc_id: collect_list + array_sort keeps per-doc
  order without a global sort. Per-doc data is bounded by document size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from samza_spark.pipeline.text import normalized


def word_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 5,
) -> DataFrame:
    """Explode each document into fixed ``seg_words``-word segments of its
    normalized text: (id, seg_idx, segment). Map-only; the segment count
    per document is ceil(n_words / seg_words), at least 1."""
    toks = F.split(normalized(F.col(text_col)), " ")
    n_segs = F.greatest(
        F.ceil(F.size(toks) / F.lit(float(seg_words))).cast("int"), F.lit(1)
    )
    seq = F.sequence(F.lit(0), n_segs - F.lit(1))
    seg = F.array_join(
        F.slice(F.col("__toks"), F.col("seg_idx") * seg_words + 1, seg_words), " "
    )
    return (
        df.select(id_col, F.explode(seq).alias("seg_idx"), toks.alias("__toks"))
        .select(id_col, "seg_idx", seg.alias("segment"))
    )


def line_segments(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Newline-split variant for corpora with real lines: (id, seg_idx,
    segment), blank lines dropped, segments trimmed (CCNet hashes
    normalized lines)."""
    lines = F.split(F.col(text_col), "\n")
    return (
        df.select(
            id_col, F.posexplode(lines).alias("seg_idx", "raw")
        )
        .select(id_col, "seg_idx", F.trim(F.lower("raw")).alias("segment"))
        .where(F.col("segment") != "")
    )


def segment_doc_freq(segments: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Document frequency per segment: (segment, df). Distinct (segment,
    id) pairs first (map-side partial dedup), then ONE count shuffle."""
    return (
        segments.select("segment", id_col)
        .distinct()
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def remove_frequent_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 5,
    min_df: int = 5,
    segmenter: str = "words",
) -> DataFrame:
    """Drop segments appearing in >= ``min_df`` distinct documents and
    reassemble the survivors in order.

    Returns one row per input document: (id, clean_text, n_segments,
    n_removed). A fully-boilerplate document survives with clean_text ''.

    The frequent-segment set is broadcast (heavy hitters are few); the
    corpus side incurs exactly one shuffle (the df count) plus the group
    for reassembly.
    """
    if segmenter == "words":
        segs = word_segments(df, text_col, id_col, seg_words)
    elif segmenter == "lines":
        segs = line_segments(df, text_col, id_col)
    else:  # pragma: no cover - guarded API
        raise ValueError(f"unknown segmenter: {segmenter!r}")

    frequent = segment_doc_freq(segs, id_col).where(F.col("df") >= min_df)
    # Mark hot segments with a broadcast left join (map-side), then fuse
    # reassembly + totals + removal count into ONE doc-keyed aggregation:
    # collect_list skips nulls, so kept segments reassemble while hot ones
    # only contribute to the counters. The corpus shuffles exactly twice
    # (df count above, this group) at any scale.
    marked = segs.join(
        F.broadcast(frequent.select("segment", F.lit(True).alias("__hot"))),
        on="segment",
        how="left",
    )
    kept_struct = F.when(
        F.col("__hot").isNull(), F.struct("seg_idx", "segment")
    )
    return marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["segment"]
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("int").alias("n_segments"),
        F.sum(F.col("__hot").isNotNull().cast("int")).cast("int").alias("n_removed"),
    )


def dedup_segments_keep_first(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 5,
    segmenter: str = "words",
) -> DataFrame:
    """CCNet-style exact segment dedup, *keep-first*: every segment that
    occurs in more than one place keeps only its globally first occurrence
    (ordered by (id, seg_idx)); all later occurrences are dropped.

    This complements :func:`remove_frequent_segments` (which removes hot
    segments from EVERY document): CCNet §3.1 deduplicates identical
    paragraphs across shards keeping one copy, so common strings survive
    exactly once in the corpus.

    Returns one row per input document:
    ``(id, clean_text, n_segments, n_removed)``.

    Scale design (100 TB): segmentation is map-only; ownership is ONE
    row_number window partitioned by the segment key — a single
    segment-keyed exchange, no join. (The groupBy-owner + join-back
    formulation shuffles the corpus TWICE on long string keys and was
    measured ~9x slower at sf0.1: 4.2s vs 0.5s.) The per-segment sort is
    bounded by the segment's occurrence count; a pathologically hot
    boilerplate segment skews its one partition either way — run
    :func:`remove_frequent_segments` first if the corpus has them.
    """
    if segmenter == "words":
        segs = word_segments(df, text_col, id_col, seg_words)
    elif segmenter == "lines":
        segs = line_segments(df, text_col, id_col)
    else:  # pragma: no cover - guarded API
        raise ValueError(f"unknown segmenter: {segmenter!r}")

    w = Window.partitionBy("segment").orderBy(F.col(id_col), F.col("seg_idx"))
    marked = segs.withColumn("__keep", F.row_number().over(w) == 1)
    kept_struct = F.when(F.col("__keep"), F.struct("seg_idx", "segment"))
    return marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["segment"]
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("int").alias("n_segments"),
        F.sum((~F.col("__keep")).cast("int")).cast("int").alias("n_removed"),
    )
