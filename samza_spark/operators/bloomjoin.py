"""Bloom-filter semi-join: prefilter the big side of a join BEFORE its
shuffle with a compact bit-array built from the small side's keys.

The classic runtime-filter trick (Bloom 1970; used by every warehouse
engine for selective fact-dimension joins): at 100 TB the dominant join
cost is shuffling the big side, most of whose rows will not survive the
join. A bloom filter of the build-side keys is a few hundred KB, checks
membership map-side with zero false negatives, and drops the
non-matching bulk before any exchange. Spark's optimizer injects these
automatically only for some plan shapes
(spark.sql.optimizer.runtime.bloomFilter.* — and `bloom_filter_agg` is
not exposed to SQL/Python); this operator states the shape explicitly
for Python-composed pipelines and keeps the whole build/probe in
Catalyst expressions:

- build: explode each key to k bit positions (seeded xxhash64 mod m),
  OR them into 64-bit words (ONE small shuffle on <= m/64 word ids),
  assemble the dense word array in a single-row aggregate — no driver
  collect anywhere.
- probe: broadcast the one-row array, check all k bits map-side
  (`forall` over the positions), keep possible members.
- exactness: a final LEFT SEMI join on the surviving rows removes bloom
  false positives, so `bloom_semi_join` returns EXACTLY the plain
  semi-join result — the filter only changes how many rows reach the
  exchange (the DuckDB oracle for the query is the plain semi-join).

Sizing: false-positive rate ~= (1 - e^(-k*n/m))^k; the default
m = 2^20 bits (128 KiB) and k = 5 gives ~1% at n = 100k keys. Pick
m ~= 10-15 bits per expected key.

Reference anchor: apache/samza joins stream-to-table per partition
(PartialJoinOperatorImpl, StreamTableJoinFunction) and has no runtime
filters; this is engine-level surface a Spark-first design adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _positions(key_col: str, m_bits: int, k: int, seed: int):
    """array<long> of the k bit positions for a key (non-negative)."""
    return F.expr(
        f"transform(sequence(0, {k - 1}), "
        f"i -> pmod(xxhash64(i + {seed}, {key_col}), {m_bits}))"
    )


def bloom_build(
    keys_df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """One-row DataFrame ``(bloom: array<long>)`` of m_bits/64 words over
    the distinct keys. Word-keyed bit_or aggregation (<= m/64 groups),
    dense assembly in a single-row map lookup — fully relational."""
    n_words = m_bits // 64
    words = (
        keys_df.select(
            F.explode(_positions(key_col, m_bits, k, seed)).alias("p")
        )
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, cast(pmod(p, 64) as int))").alias("mask"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(mask)").alias("m"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "m"))).alias("__mm")
    ).select(
        F.expr(
            f"transform(sequence(0, {n_words - 1}), "
            f"i -> coalesce(element_at(__mm, i), 0L))"
        ).alias("bloom")
    )


def bloom_prefilter(
    df: DataFrame,
    key_col: str,
    bloom_df: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Rows of ``df`` whose key is POSSIBLY in the filter (no false
    negatives). Broadcast of the one-row array + a map-side `forall`
    bit check; runs before any exchange the caller adds downstream."""
    cond = F.expr(
        f"forall(transform(sequence(0, {k - 1}), "
        f"i -> pmod(xxhash64(i + {seed}, {key_col}), {m_bits})), "
        f"p -> (element_at(bloom, cast(p div 64 as int) + 1) "
        f"& shiftleft(1L, cast(pmod(p, 64) as int))) <> 0)"
    )
    return (
        df.crossJoin(F.broadcast(bloom_df)).where(cond).drop("bloom")
    )


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    m_bits: int = 1 << 20,
    k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """EXACT left-semi join of ``big`` against ``small``'s keys, with a
    bloom prefilter ahead of the join so only possible members reach the
    exchange. Output is identical to ``big.join(small, on, 'left_semi')``
    — the bloom stage has no false negatives and the final semi join
    removes its false positives."""
    keys = small.select(on).distinct()
    bloom = bloom_build(keys, on, m_bits, k, seed)
    pre = bloom_prefilter(big, on, bloom, m_bits, k, seed)
    return pre.join(keys, on, "left_semi")
