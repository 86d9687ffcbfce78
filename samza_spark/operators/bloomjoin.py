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


def bloom_fpp_audit(
    insert_df: DataFrame,
    probe_df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 14,
    k: int = 4,
    salt: str = "bf",
) -> DataFrame:
    """Observed false-positive-rate audit for a Bloom-filter sizing
    (m, k): build the filter from ``insert_df``'s keys, probe with
    ``probe_df``'s keys that are NOT in the insert set, and report the
    measured FPP next to the bit-load — the pre-flight check before
    shipping a decontamination/runtime filter across a 100 TB scan
    (an undersized filter silently passes contamination; an oversized
    one wastes broadcast bytes). Positions use the md5 family
    (``md5(j|salt|key) % m``), so the ENTIRE audit — bit array included
    — replays in ANSI SQL; the serving-path filter (bloom_build) keeps
    its faster xxhash64 positions, and this audit validates the
    (m, k, n) operating point, which is hash-family-independent at
    these load factors.

    One summary row: ``(m_bits, k, n_insert, set_bits, load_ppm,
    n_probe_neg, false_pos, fpp_ppm)``. Shape: two bounded aggregates
    (word table <= m/64 rows, probe verdicts one row per probe key) —
    the probe side checks bits via one broadcast word-table join. Words
    are 32-bit (mask <= 2^31) because DuckDB's BIGINT left-shift
    errors on 1<<63 — the audit's bit array must replay verbatim.
    """
    def positions(col: str):
        return F.expr(
            f"transform(sequence(0, {int(k) - 1}), j -> "
            f"cast(conv(substr(md5(concat(cast(j as string), '|{salt}|', "
            f"cast({col} as string))), 1, 12), 16, 10) as bigint) "
            f"% {int(m_bits)})"
        )

    ins = insert_df.select(F.col(key_col).alias("__k")).distinct()
    words = (
        ins.select(F.explode(positions("__k")).alias("p"))
        .select(
            F.expr("cast(p div 32 as int)").alias("w"),
            F.expr("shiftleft(1L, cast(pmod(p, 32) as int))").alias("mask"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(mask)").alias("m"))
    )
    n_insert = ins.agg(F.count(F.lit(1)).alias("n_insert"))
    set_bits = words.agg(
        F.sum(F.expr("bit_count(m)")).cast("long").alias("set_bits")
    )
    # probe keys genuinely absent from the insert set (left anti join)
    neg = (
        probe_df.select(F.col(key_col).alias("__k"))
        .distinct()
        .join(ins, "__k", "left_anti")
    )
    probe_bits = (
        neg.select("__k", F.explode(positions("__k")).alias("p"))
        .select(
            "__k",
            F.expr("cast(p div 32 as int)").alias("w"),
            F.expr("shiftleft(1L, cast(pmod(p, 32) as int))").alias("mask"),
        )
        .join(F.broadcast(words), "w", "left")
        .select(
            "__k",
            F.expr(
                "case when m is not null and (m & mask) <> 0 then 1 else 0 end"
            ).alias("hit"),
        )
        .groupBy("__k")
        .agg(F.min("hit").alias("all_set"))
    )
    verdict = probe_bits.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe_neg"),
        F.sum("all_set").cast("long").alias("false_pos"),
    )
    return (
        n_insert.crossJoin(F.broadcast(set_bits))
        .crossJoin(F.broadcast(verdict))
        .select(
            F.lit(int(m_bits)).cast("long").alias("m_bits"),
            F.lit(int(k)).cast("int").alias("k"),
            F.col("n_insert").cast("long").alias("n_insert"),
            "set_bits",
            F.expr(f"set_bits * 1000000 div {int(m_bits)}L").alias(
                "load_ppm"
            ),
            "n_probe_neg",
            "false_pos",
            F.expr(
                "case when n_probe_neg > 0 then "
                "false_pos * 1000000 div n_probe_neg else 0 end"
            ).alias("fpp_ppm"),
        )
    )
