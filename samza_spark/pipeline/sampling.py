"""Dataset-shaping operators: deterministic train/val/test splits,
hash-stratified sampling, and contiguous document packing.

These are the reproducibility-critical stages of a training-data
pipeline: all assignment is derived from md5 of (salt, id) — no RNG
state, stable across runs/partitionings/engines, and a DuckDB oracle
replays every decision bit-for-bit. Everything is pure Catalyst
(whole-stage codegen), usable in batch and streaming plans.

At 100 TB: split/sample are map-only (no shuffle at all); packing
shuffles once on the shard key and windows within shards, so no global
sort or single-partition bottleneck exists.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _hash_bucket(id_col: str, salt: str, mod: int) -> Column:
    """Deterministic bucket in [0, mod): first 8 md5 hex chars of
    'salt|id' as an integer — the cross-engine-reproducible hash
    (DuckDB: ('0x' || substr(md5(...), 1, 8))::BIGINT % mod)."""
    return F.expr(
        f"cast(conv(substr(md5(concat('{salt}', '|', cast({id_col} as string))), 1, 8), 16, 10) "
        f"as bigint) % {mod}"
    )


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: Sequence[tuple] = (("train", 98), ("val", 1), ("test", 1)),
    salt: str = "split0",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = md5-hash of
    (salt, id) mod total-weight, split = the bucket's weight band.
    Stable under corpus growth (a doc's split never changes when other
    docs are added) and reproducible across engines — unlike
    ``DataFrame.randomSplit``, which depends on partitioning and seed
    plumbing. Map-only."""
    total = sum(w for _, w in weights)
    bucket = _hash_bucket(id_col, salt, total)
    acc = 0
    conds = []
    for name, w in weights[:-1]:
        acc += w
        conds.append((acc, name))
    expr: Column = F.lit(weights[-1][0])
    for acc_val, name in reversed(conds):
        expr = F.when(bucket < acc_val, F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    fractions: Mapping[str, float],
    stratum_col: str,
    id_col: str = "doc_id",
    salt: str = "sample0",
    default_fraction: float = 0.0,
    granularity: int = 10_000,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its hash
    bucket (out of ``granularity``) falls below the stratum's fraction.
    The standard rebalancing stage (e.g. downsample the dominant
    language); same stability story as :func:`assign_split`. Map-only,
    filter pushes into the scan."""
    bucket = _hash_bucket(id_col, salt, granularity)
    thr: Column = F.lit(int(default_fraction * granularity))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(int(frac * granularity))
        ).otherwise(thr)
    return df.filter(bucket < thr)


def mixture_resample(
    df: DataFrame,
    target_weights: Mapping[str, int],
    stratum_col: str,
    id_col: str = "doc_id",
    salt: str = "mix0",
    granularity: int = 10_000,
) -> DataFrame:
    """Resample to a target domain mixture (the data-mixing stage of a
    training pipeline, e.g. DoReMi/Pile-style source weighting — public
    recipes) WITHOUT upsampling: find the largest total size T at which
    every stratum can meet its target share from the rows it has
    (T = min over strata of n_g * granularity / w_g), then keep each
    stratum's deterministic hash-sample of floor(w_g * T / granularity)
    rows' worth of probability mass.

    All arithmetic is integer (weights in parts of ``granularity``,
    e.g. 5000 = 50%), so the kept set is bit-reproducible across engines.
    Strata absent from ``target_weights`` are dropped. Rows keep their
    columns plus ``keep_frac_bp`` (the applied per-stratum threshold).

    Scale: ONE tiny aggregation (stratum counts, broadcast back as a
    literal-free join); the filter itself is map-side.
    """
    if not target_weights:
        raise ValueError("target_weights must be non-empty")
    if sum(target_weights.values()) > granularity:
        raise ValueError("target weights exceed granularity (over 100%)")
    counts = (
        df.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col(stratum_col).isin(list(target_weights)))
    )
    # T = min_g floor(n_g * granularity / w_g): the largest total honoring
    # every stratum's share without upsampling
    t_expr = F.min(
        F.floor(
            F.col("__n")
            * F.lit(granularity)
            / F.coalesce(
                *[
                    F.when(F.col(stratum_col) == s, F.lit(w))
                    for s, w in sorted(target_weights.items())
                ]
            )
        )
    ).alias("__t")
    totals = counts.agg(t_expr)
    # per-stratum keep threshold in hash buckets: floor(w_g*T/n_g) of
    # granularity
    per_stratum = counts.join(F.broadcast(totals)).select(
        stratum_col,
        F.floor(
            F.coalesce(
                *[
                    F.when(F.col(stratum_col) == s, F.lit(w))
                    for s, w in sorted(target_weights.items())
                ]
            )
            * F.col("__t")
            / F.col("__n")
        )
        .cast("long")
        .alias("keep_frac_bp"),
    )
    bucket = _hash_bucket(id_col, salt, granularity)
    return (
        df.join(F.broadcast(per_stratum), on=stratum_col, how="inner")
        .where(bucket < F.col("keep_frac_bp"))
    )


def pack_contiguous(
    df: DataFrame,
    cost_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "pack0",
    out_cols: tuple = ("shard", "bin"),
) -> DataFrame:
    """Pack documents into budget-bounded contiguous bins — the
    sequence-packing stage that groups docs into ~``budget``-cost chunks
    (e.g. context-window construction). Docs are sharded by hash (so
    packing distributes over the cluster; ONE shuffle on the shard key),
    ordered by id within each shard, and assigned
    ``bin = floor(exclusive-running-cost / budget)``.

    Semantics note: this is boundary-crossing packing, not reset-greedy —
    a bin may overshoot the budget by at most one document (the one that
    crosses the boundary), in exchange for a closed-form, fully
    relational, engine-reproducible assignment. A reset-greedy packer is
    inherently sequential per shard and not expressible as a window."""
    shard_col, bin_col = out_cols
    shard = _hash_bucket(id_col, salt, n_shards)
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn(shard_col, shard)
        .withColumn(
            bin_col,
            F.floor(
                (F.sum(F.col(cost_col)).over(w) - F.col(cost_col)) / F.lit(budget)
            ).cast("bigint"),
        )
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    cost_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "pack0",
    mode: str = "overwrite",
) -> DataFrame:
    """Materialize the corpus as training shards: deterministic hash
    sharding + budget-bounded contiguous bins (:func:`pack_contiguous`),
    written as one parquet directory per shard (``partitionBy``), rows
    ordered (bin, id) within each shard so a sequential reader walks
    documents in packing order.

    The export stage of the pipeline: at 100 TB this is one shuffle
    (repartition on the shard key — each task owns whole shards, so the
    writer produces n_shards directories without small-file explosion)
    followed by a sorted local write. Shard/bin assignment is md5-derived
    (no RNG), so re-running the export on the same corpus produces
    byte-identical layout — the reproducibility contract a training run
    depends on.

    Returns the packed DataFrame (with shard/bin columns) for auditing;
    the write has already happened.
    """
    packed = pack_contiguous(
        df, cost_col, budget, id_col=id_col, n_shards=n_shards, salt=salt
    )
    (
        packed.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "bin", id_col)
        .write.partitionBy("shard")
        .mode(mode)
        .parquet(path)
    )
    return packed


def uniform_sample_exact_k(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    salt: str = "sample0",
) -> DataFrame:
    """Exactly-``k``-row uniform sample, deterministic and engine-
    reproducible: rank every row by the md5 hash of (salt, id) and keep
    the ``k`` smallest (id as tiebreaker for duplicate ids).

    ``DataFrame.sample`` gives a BINOMIAL sample (±√n rows) and depends
    on partition layout; reservoir sampling needs a sequential pass.
    Hash-ranking gives exact cardinality, stability under reruns and
    repartitioning, and a DuckDB-replayable decision for every row.

    Plan shape: TakeOrderedAndProject — per-partition top-k then a k-row
    merge; no global sort, no driver state beyond k rows. Changing
    ``salt`` draws an independent sample.
    """
    h = F.md5(
        F.concat(
            F.lit(salt), F.lit("|"), F.col(id_col).cast("string")
        )
    ).alias("__h")
    return (
        df.select("*", h)
        .orderBy(F.col("__h").asc(), F.col(id_col).asc())
        .limit(int(k))
        .drop("__h")
    )


def weighted_sample_exact_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample0",
    priority_col: str = "priority",
) -> DataFrame:
    """Exactly-``k`` weighted sample without replacement — sequential
    Poisson / priority sampling (Ohlsson 1998; Duffield-Lund-Thorup 2007,
    both public): each row draws a deterministic uniform u from the md5
    hash of (salt, id) and is ranked by ``priority = u / weight``; the k
    smallest priorities win, so inclusion probability is ~proportional to
    weight (the classic weighted-reservoir shape, e.g. upsampling long
    documents or high-quality sources).

    Determinism contract: u is the first 13 md5 hex chars as an integer
    (52 bits, exactly representable in a double) + 1, and the priority is
    ONE IEEE double division of exact integers — bit-identical in any
    engine, unlike ln-based exponential keys (A-ES) whose transcendental
    differs in the last ulp between libm and the JVM. Rows with NULL or
    non-positive weight are excluded (they can never be sampled).

    Plan shape: map-only scoring + TakeOrderedAndProject (per-partition
    top-k, k-row merge) — no global sort, no RNG state, rerun-stable
    under any partitioning. Changing ``salt`` draws an independent
    sample.
    """
    u = (
        F.expr(
            f"cast(conv(substr(md5(concat('{salt}', '|', "
            f"cast({id_col} as string))), 1, 13), 16, 10) as bigint) + 1"
        )
    )
    pr = (u.cast("double") / F.col(weight_col).cast("double")).alias(priority_col)
    return (
        df.filter(F.col(weight_col).cast("double") > 0)
        .select("*", pr)
        .orderBy(F.col(priority_col).asc(), F.col(id_col).asc())
        .limit(int(k))
    )


def stratified_sample_exact_k(
    df: DataFrame,
    k_per_stratum: int,
    stratum_col: str,
    id_col: str = "doc_id",
    salt: str = "strat0",
) -> DataFrame:
    """Exactly ``k_per_stratum`` rows from EVERY stratum (fewer only if
    the stratum is smaller) — the eval-set construction shape ("200 docs
    per language, reproducibly"), complementing the rate-based
    :func:`stratified_sample` (binomial per stratum) and the global
    :func:`uniform_sample_exact_k`.

    Same determinism contract as the other samplers: rank within each
    stratum by the md5 hash of (salt, id), keep the k smallest —
    rerun/engine/partitioning stable, and nested (k'-per-stratum < k is
    a subset of k-per-stratum).

    Plan: ONE stratum-partitioned rank window — groups rank in parallel
    across the cluster; no global sort, no driver state. A stratum so
    hot it swamps one task is exactly what :func:`key_skew_report`
    flags; pre-split such strata or use the rate-based sampler."""
    h = F.md5(
        F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(stratum_col).orderBy(
        h.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= int(k_per_stratum))
        .drop("__rn")
    )


def stratified_weighted_sample_exact_k(
    df: DataFrame,
    k_per_stratum: int,
    weight_col: str,
    stratum_col: str,
    id_col: str = "doc_id",
    salt: str = "wstrat0",
) -> DataFrame:
    """Exactly ``k_per_stratum`` rows per stratum with inclusion odds
    proportional to ``weight_col`` — per-stratum priority sampling
    (the composition of :func:`weighted_sample_exact_k` and
    :func:`stratified_sample_exact_k`): rank ``u/weight`` priorities
    WITHIN each stratum, keep the k smallest. One stratum-partitioned
    window, map-only scoring, non-positive weights excluded; same
    determinism contract as both parents."""
    u = F.expr(
        f"cast(conv(substr(md5(concat('{salt}', '|', "
        f"cast({id_col} as string))), 1, 13), 16, 10) as bigint) + 1"
    )
    pr = (u.cast("double") / F.col(weight_col).cast("double")).alias("priority")
    w = Window.partitionBy(stratum_col).orderBy(
        F.col("priority").asc(), F.col(id_col).asc()
    )
    return (
        df.filter(F.col(weight_col).cast("double") > 0)
        .select("*", pr)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= int(k_per_stratum))
        .drop("__rn")
    )


def shard_manifest(
    df: DataFrame,
    cost_col: str,
    id_col: str = "doc_id",
    shard_col: str = "shard",
    salt: str = "manifest0",
) -> DataFrame:
    """Per-shard export manifest: row count, total cost, and a
    content-derived checksum — the artifact a training run pins so a
    re-export is verifiable without re-reading the shards.

    The checksum is the SUM of per-row md5-derived 60-bit integers
    (mod 2^62) — COMMUTATIVE, so it needs no per-shard ordering or
    collect_list: one aggregate with map-side combine, exact in any
    engine (DECIMAL/HUGEINT sums), and any dropped/duplicated/substituted
    row changes it. An ordered md5-of-concatenation would hash the same
    set more strongly but requires materializing each shard's id list in
    one task — the non-scalable shape this deliberately avoids.
    """
    return (
        df.groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(cost_col).cast("long")).alias("total_cost"),
            F.expr(
                f"cast(sum(cast(conv(substr(md5(concat('{salt}', '|', "
                f"cast({id_col} as string))), 1, 15), 16, 10) as decimal(38,0))) "
                f"% 4611686018427387904 as bigint)"
            ).alias("id_checksum"),
        )
    )


def write_partitioned_table(
    df: DataFrame,
    path: str,
    partition_cols: "Sequence[str]",
    mode: str = "overwrite",
    dynamic: bool = False,
    target_files_per_partition: int = 1,
) -> None:
    """Hive-layout partitioned parquet sink (``col=value`` directories).

    The 100 TB layout contract: readers filtering on ``partition_cols``
    must PRUNE at the directory level (PartitionFilters in the scan, zero
    bytes read for excluded partitions) — see test_stats for the plan
    assertion. Rows are pre-shuffled onto their partition keys so each
    output partition is written by ``target_files_per_partition`` tasks:
    without that, every one of the N writing tasks can emit a file into
    every partition directory (N x P small files — the classic export
    mistake at scale).

    ``dynamic=True`` + overwrite replaces ONLY the partitions present in
    ``df`` (Spark's dynamic partition overwrite), the idempotent shape
    for re-running one day/source of a backfill without clobbering the
    rest of the table.
    """
    cols = [F.col(c) for c in partition_cols]
    n_files = max(int(target_files_per_partition), 1)
    if n_files == 1:
        # hash-shuffle on the partition keys: each key value lands in ONE
        # task, so the partitionBy writer emits one file per directory
        writer = df.repartition(*cols)
    else:
        # deterministic row salt widens each partition value to n_files
        # writing tasks (bigger partitions, parallel write)
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_files)
        )
        writer = df.withColumn("__salt", salt).repartition(
            *cols, F.col("__salt")
        ).drop("__salt")
    w = writer.write.partitionBy(*partition_cols).mode(mode)
    if dynamic:
        w = w.option("partitionOverwriteMode", "dynamic")
    w.parquet(path)


def zorder_value(col_a: str, col_b: str, bits: int = 16) -> "F.Column":
    """Morton/Z-order interleave of two non-negative integer keys (bit i
    of a -> bit 2i, bit i of b -> bit 2i+1): rows close in BOTH
    dimensions land close on the single z axis, so range-partitioning by
    z clusters multi-dimensional locality into the same files — the
    public Delta/Iceberg OPTIMIZE ZORDER layout trick that lets min/max
    file statistics prune scans filtered on either column.

    Pure codegen integer arithmetic per row (map-only), exact in any
    engine. Keys are masked to ``bits`` low bits; z fits 2*bits <= 62.

    The interleave is the closed-form bit-spreading sequence (the public
    "magic masks" Morton trick: widen each operand's bits to even
    positions with five shift-or-mask steps, then OR the odd-shifted
    second operand) instead of a ``bits``-iteration interpreted
    ``aggregate`` fold — the fold ran an interpreted lambda per bit per
    row, the spread is a handful of codegen bitops. Identical outputs:
    the fold summed disjoint powers of two; the spread ORs exactly the
    same bits (both mask first, so negatives agree too).
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    mask = (1 << bits) - 1

    def spread(col: str) -> str:
        x = f"(cast({col} as bigint) & {mask})"
        for sh, m in (
            (16, 0x0000FFFF0000FFFF),
            (8, 0x00FF00FF00FF00FF),
            (4, 0x0F0F0F0F0F0F0F0F),
            (2, 0x3333333333333333),
            (1, 0x5555555555555555),
        ):
            x = f"((({x}) | shiftleft(({x}), {sh})) & {m}L)"
        return x

    return F.expr(f"({spread(col_a)} | shiftleft({spread(col_b)}, 1))")


def zorder_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_buckets: int = 16,
    bits: int = 16,
) -> DataFrame:
    """Assign each row its z-value and target layout bucket
    (``bucket = z * n_buckets div 2^(2*bits)`` — fixed-width z ranges,
    no sampling pass, deterministic). Writing with
    ``write_partitioned_table(..., ['zbucket'])`` — or
    ``repartitionByRange('z')`` for file-level clustering — gives scans
    filtered on EITHER column a bounded bucket range to prune against.
    """
    z = zorder_value(col_a, col_b, bits)
    span = 1 << (2 * bits)
    return df.withColumn("z", z).withColumn(
        "zbucket", F.expr(f"z * {int(n_buckets)} div {span}").cast("int")
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    weights: Sequence[tuple] = (("train", 98), ("val", 1), ("test", 1)),
    salt: str = "split0",
    out_col: str = "split",
    comp_col: str = "component",
) -> DataFrame:
    """Train/test split that cannot leak near-duplicates across splits:
    documents are first grouped by the connected components of the
    near-dup pair graph (``pairs`` = (a, b) verified duplicate pairs,
    e.g. from minhash_lsh_candidates + jaccard_verify), then the WHOLE
    component is assigned one split by hashing the component root — so
    two near-identical documents can never land in train and test
    (the eval-contamination failure mode hash-splitting on raw doc ids
    has; Lee et al. 2022 "Deduplicating Training Data Makes Language
    Models Better" documents the effect).

    Documents in no pair are their own singleton component (left join +
    coalesce — no extra shuffle beyond the component join). Split
    assignment is the same md5(salt|id) band arithmetic as
    :func:`assign_split` — deterministic, engine-reproducible, stable
    under corpus growth as long as component roots are stable.
    """
    from samza_spark.pipeline.dedup import connected_components

    comps = connected_components(pairs, id_col=id_col)
    out = (
        df.join(comps, on=id_col, how="left")
        .withColumn(comp_col, F.coalesce(F.col("component"), F.col(id_col)))
    )
    if comp_col != "component":
        out = out.drop("component")
    return assign_split(
        out, id_col=comp_col, weights=weights, salt=salt, out_col=out_col
    )


def stratified_kfold(
    df: DataFrame,
    k: int = 5,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "fold0",
    out_col: str = "fold",
) -> DataFrame:
    """Stratified k-fold assignment for cross-validation: within each
    stratum, rows are ordered by a deterministic md5 shuffle key and
    dealt round-robin into folds 0..k-1 — every (stratum, fold) cell is
    balanced to within one row BY CONSTRUCTION (plain hash-mod gives
    only expected balance; small strata can skew badly). One window
    partitioned by the stratum (parallel across strata — the skew
    ceiling is the largest stratum, same as any per-stratum rank), no
    RNG, reproducible in any engine from the md5 formula.
    """
    key = F.md5(
        F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(stratum_col).orderBy(key, F.col(id_col))
    return df.withColumn(
        out_col, ((F.row_number().over(w) - 1) % k).cast("int")
    )


def greedy_max_coverage(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 3,
) -> DataFrame:
    """Submodular data selection by greedy maximum coverage: pick ``k``
    documents that together cover the most distinct word n-grams — the
    classic facility-location/coverage objective used to choose compact,
    diverse fine-tuning subsets (greedy is (1 - 1/e)-optimal, Nemhauser
    et al. 1978, and in practice near-exact).

    Each of the bounded ``k`` rounds is fully distributed: gains are one
    combinable count over the remaining (doc, gram) pairs, the winner is
    a 1-row ``orderBy().limit(1)`` (TakeOrderedAndProject — nothing
    sorts the corpus), and coverage removal is one gram-keyed anti-join.
    The per-round ``collect()`` moves exactly one row; lineage is
    truncated per round with an eager localCheckpoint so round r's plan
    never replays rounds 1..r-1. Driver round-trips are O(k) — the
    selection budget, not the corpus — the same bounded-iteration
    contract as k-core peeling and the BPE merge loop.

    Returns one row per selection round:
    ``(round, id, gain, covered_total)`` with the marginal-gain
    monotonicity guarantee (gains are non-increasing).
    """
    from samza_spark.pipeline.dedup import word_ngrams

    spark = df.sparkSession
    # word_ngrams is array_distinct per doc, so the exploded (id, g)
    # pairs are already unique — no corpus-wide distinct shuffle needed.
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams(text_col, ngram_n)).alias("g"),
    ).localCheckpoint(eager=True)
    remaining = grams
    out, covered_total = [], 0
    for rnd in range(1, int(k) + 1):
        top = (
            remaining.groupBy("id")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.desc("gain"), F.asc("id"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        did, gain = top[0]["id"], top[0]["gain"]
        covered_total += gain
        out.append((rnd, did, gain, covered_total))
        if rnd < k:
            # one doc's gram set — always broadcast-sized
            sel = F.broadcast(remaining.filter(F.col("id") == did).select("g"))
            remaining = (
                remaining.filter(F.col("id") != did)
                .join(sel, on="g", how="left_anti")
                .localCheckpoint(eager=True)
            )
    id_type = dict(df.dtypes)[id_col]
    return spark.createDataFrame(
        out, f"round int, {id_col} {id_type}, gain long, covered_total long"
    )


def embargo_split(
    df: DataFrame,
    train_end: str,
    embargo: str = "7 days",
    ts_col: str = "ts",
    group_col: "str | None" = None,
) -> DataFrame:
    """Temporal train/test split with an EMBARGO gap — the leakage-safe
    split for time-ordered data (financial ML / forecasting evaluation,
    and the temporal analog of decontamination for training corpora):
    rows at or before ``train_end`` are ``train``, rows inside
    ``(train_end, train_end + embargo]`` are ``embargo`` (discarded —
    they leak label horizon into both sides), later rows are ``test``.

    With ``group_col`` (purged split): any group that has rows in the
    embargo window is ALSO dropped from train — its trailing context
    overlaps the gap, the group-level analog of overlapping-sample
    purging in purged k-fold CV.

    Map-only labeling (two timestamp comparisons); the purge adds one
    broadcast semi-join against the (tiny) embargoed-group set. Output:
    input columns + ``split`` ('train' | 'embargo' | 'test' | 'purged').
    """
    t_end = F.to_timestamp(F.lit(train_end))
    gap_end = t_end + F.expr(f"INTERVAL {embargo}")
    split = (
        F.when(F.col(ts_col) <= t_end, F.lit("train"))
        .when(F.col(ts_col) <= gap_end, F.lit("embargo"))
        .otherwise(F.lit("test"))
    )
    out = df.withColumn("split", split)
    if group_col is not None:
        embargoed = (
            out.filter(F.col("split") == "embargo")
            .select(group_col)
            .distinct()
        )
        out = out.join(
            F.broadcast(embargoed.withColumn("__purge", F.lit(True))),
            on=group_col,
            how="left",
        ).withColumn(
            "split",
            F.when(
                (F.col("split") == "train") & F.col("__purge").isNotNull(),
                F.lit("purged"),
            ).otherwise(F.col("split")),
        ).drop("__purge")
    return out


def balanced_shards(
    df: DataFrame,
    cost_col: str,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cost-balanced shard assignment for export: serpentine (folded
    round-robin) placement over the descending-cost order — the
    relational approximation of LPT scheduling. Row with global cost
    rank r goes to shard ``pos`` if ``pos < n`` else ``2n - 1 - pos``
    where ``pos = (r - 1) mod 2n``: consecutive heavy documents land on
    DIFFERENT shards and each full serpentine pass adds exactly one doc
    to every shard from both ends of the cost order, so shard totals
    track each other to within one document's cost per pass.

    Use over hash sharding when per-shard SIZE balance matters more than
    content addressing (training shards wanting equal step counts). The
    rank is the range-exchange :func:`~samza_spark.operators.rank.
    global_rank` — no single-partition sort.
    """
    from samza_spark.operators.rank import global_rank

    ranked = global_rank(
        df,
        order_by=[F.col(cost_col).desc(), F.col(id_col).asc()],
        rank_col="__r",
    )
    pos = (F.col("__r") - 1) % (2 * n_shards)
    shard = F.when(pos < n_shards, pos).otherwise(2 * n_shards - 1 - pos)
    return ranked.withColumn("shard", shard.cast("int")).drop("__r")


def shard_balance_report(
    df: DataFrame,
    cost_col: str,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-shard doc/cost totals for :func:`balanced_shards` plus each
    shard's exact-ppm share of the corpus cost — the export-balance
    audit (ideal share = 1e6 / n_shards)."""
    shards = balanced_shards(df, cost_col, n_shards, id_col=id_col)
    per = shards.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(cost_col).cast("long")).alias("total_cost"),
    )
    total = per.agg(F.sum("total_cost").alias("__t"))
    return (
        per.join(F.broadcast(total))
        .select(
            "shard",
            "n_docs",
            "total_cost",
            F.expr("(total_cost * 1000000) div __t").alias("share_ppm"),
        )
        .orderBy("shard")
    )


def range_partition_plan(
    df: DataFrame,
    col: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Range-partitioning plan for a sorted export: exact discrete
    quantile boundaries of ``col`` (the value at sorted position
    ``ceil(N * i / n)`` — percentile_disc semantics, deterministic on
    ties by value order) plus the EXACT row count each bucket would
    receive and its deviation from the N/n target in ppm. This is the
    audit beside Spark's own RangePartitioner: the production writer
    samples (``df.repartitionByRange``), the plan here is the exact
    answer the sample is trying to approximate, so skewed boundaries
    show up as ``dev_ppm`` before a 100 TB sort job is launched.

    Shape: one single-column sort (rank window over the projected
    column — the same cost class as the range-exchange it audits) into
    an n-row boundary table, then one broadcast range-join back for
    counts. Emits ``(bucket, hi, n_rows, target, dev_ppm)`` where
    ``hi`` is the bucket's inclusive upper boundary (last bucket takes
    the max).
    """
    from samza_spark.operators.rank import global_rank

    vals = df.select(F.col(col).cast("long").alias("v"))
    # exact global positions WITHOUT a single-partition window: range
    # exchange + per-partition offsets (operators/rank.py) — the same
    # plan shape as the repartitionByRange this operator audits. Ties
    # need no extra tiebreaker here: equal values share a boundary
    # bucket by construction (max(v) per bucket is tie-invariant).
    total = vals.agg(F.count(F.lit(1)).alias("n_total"))
    ranked = global_rank(vals, [F.col("v")], rank_col="rn").crossJoin(
        F.broadcast(total)
    )
    nb = int(n_buckets)
    # boundary i (1..n) = value at sorted position ceil(N * i / n),
    # computed as the pure-integer ceil (rn*nb-1) div N + 1 — no
    # cross-engine doubles anywhere in the plan
    bounds = (
        ranked.withColumn(
            "bucket",
            F.expr(f"cast((rn * {nb} - 1) div n_total + 1 as int)"),
        )
        .groupBy("bucket")
        .agg(F.max("v").alias("hi"), F.max("n_total").alias("n_total"))
    )
    # rows land by VALUE interval (lo, hi], not by rank: ties cannot be
    # split across a value boundary, so a heavy key collapses adjacent
    # boundaries and the earlier bucket absorbs the whole run — exactly
    # the skew a real repartitionByRange would produce. lo = lag(hi).
    w_b = Window.partitionBy(F.lit(1)).orderBy("bucket")
    intervals = bounds.withColumn("lo", F.lag("hi").over(w_b))
    counts = (
        vals.join(
            F.broadcast(intervals),
            (F.col("v") <= F.col("hi"))
            & (F.col("lo").isNull() | (F.col("v") > F.col("lo"))),
            "inner",
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    return (
        intervals.join(counts, "bucket", "left")
        .select(
            "bucket",
            "hi",
            F.coalesce(F.col("n_rows"), F.lit(0).cast("long")).alias(
                "n_rows"
            ),
            F.expr(f"n_total div {nb}").alias("target"),
            # CASE guard: fewer rows than buckets makes target 0 — Spark
            # div would return NULL while the DuckDB oracle's // raises,
            # so degenerate inputs get an explicit dev_ppm = 0 instead of
            # a cross-engine divergence (same idiom as tail_attribution).
            F.expr(
                f"case when n_total div {nb} > 0 then "
                f"(coalesce(n_rows, 0) - n_total div {nb}) * 1000000 "
                f"div (n_total div {nb}) else 0 end"
            ).alias("dev_ppm"),
        )
    )
