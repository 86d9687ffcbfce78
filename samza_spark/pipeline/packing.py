"""Training-sequence assembly: turn budget-bounded packing bins into the
artifact a training loader actually consumes — per-sequence document
lists with segment lengths and offsets (position-id bases), total cost,
and padding waste.

Builds on :func:`samza_spark.pipeline.sampling.pack_contiguous` (the
boundary-crossing relational packer): this module aggregates each
(shard, bin) into ONE sequence row. The per-bin aggregation is the only
shuffle beyond packing's shard exchange, and a bin holds at most
~budget/min_cost documents, so the collected arrays are bounded by the
context budget — never corpus-sized.

Scale posture at 100 TB: shard hash exchange -> per-shard window (both
from pack_contiguous) -> one (shard, bin)-keyed aggregate with map-side
partials. No driver collect, no global sort; arrays are context-window
sized by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from samza_spark.pipeline.sampling import pack_contiguous


def assemble_sequences(
    df: DataFrame,
    cost_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "pack0",
) -> DataFrame:
    """One row per packed training sequence: ``(shard, bin, n_docs,
    doc_ids, seg_lengths, seg_offsets, total_cost, pad_waste)``.

    * ``doc_ids`` — documents in packing order (ascending id within the
      shard, the pack_contiguous order).
    * ``seg_lengths[i]`` — cost (token count) of ``doc_ids[i]``; the
      attention-mask segment lengths.
    * ``seg_offsets[i]`` — exclusive prefix sum of lengths; the position
      at which segment ``i`` starts (position-id base per document).
    * ``pad_waste`` — ``max(budget - total_cost, 0)``: tokens of padding
      a fixed-``budget`` context spends on this sequence (bins may also
      OVERSHOOT by at most one document — boundary-crossing packing —
      in which case ``pad_waste`` is 0 and ``total_cost > budget``).

    The prefix sum runs inside one array expression per bin (bins are
    context-window sized, so the quadratic slice-sum is over a handful
    of elements — deliberately NOT another window over the corpus).
    """
    packed = pack_contiguous(
        df, cost_col, budget, id_col=id_col, n_shards=n_shards, salt=salt
    )
    segs = F.array_sort(
        F.collect_list(
            F.struct(F.col(id_col).alias("id"), F.col(cost_col).alias("c"))
        )
    )
    agged = packed.groupBy("shard", "bin").agg(segs.alias("__segs"))
    lengths = F.transform(F.col("__segs"), lambda s: s["c"].cast("long"))
    offsets = F.expr(
        "transform(__segs, (s, i) -> aggregate(slice(__segs, 1, i), 0L, "
        "(acc, x) -> acc + x.c))"
    )
    return agged.select(
        "shard",
        "bin",
        F.size("__segs").alias("n_docs"),
        F.transform(F.col("__segs"), lambda s: s["id"]).alias("doc_ids"),
        lengths.alias("seg_lengths"),
        offsets.alias("seg_offsets"),
        F.aggregate(
            lengths, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("total_cost"),
        F.greatest(
            F.lit(budget)
            - F.aggregate(lengths, F.lit(0).cast("long"), lambda acc, x: acc + x),
            F.lit(0),
        ).cast("long").alias("pad_waste"),
    )


def packing_stats(
    df: DataFrame,
    cost_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "pack0",
) -> DataFrame:
    """Corpus-level packing efficiency report, one row: sequences, docs,
    payload tokens, padding tokens, overshoot tokens, and utilization in
    exact integer ppm (payload / (payload + padding))."""
    seqs = assemble_sequences(
        df, cost_col, budget, id_col=id_col, n_shards=n_shards, salt=salt
    )
    return seqs.agg(
        F.count(F.lit(1)).alias("n_sequences"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("total_cost").cast("long").alias("payload"),
        F.sum("pad_waste").cast("long").alias("padding"),
        F.sum(
            F.greatest(F.col("total_cost") - F.lit(budget), F.lit(0).cast("long"))
        ).cast("long").alias("overshoot"),
        F.expr(
            "cast((sum(total_cost) * 1000000) div "
            "(sum(total_cost) + sum(pad_waste)) as bigint)"
        ).alias("utilization_ppm"),
    )
