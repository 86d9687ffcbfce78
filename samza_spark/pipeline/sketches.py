"""Mergeable frequency sketches as *relational* state.

Count-min (Cormode & Muthukrishnan 2005) kept as a (depth, bucket, c)
table instead of an opaque binary blob: construction, merge, and point
estimation are all plain integer relational algebra, so

* the sketch is **exactly mergeable** — ``sketch(A ∪ B)`` equals the
  cell-wise sum of ``sketch(A)`` and ``sketch(B)`` (count-min is linear),
  which is what makes per-shard sketches roll up into a corpus sketch
  with no rescan (the matview/incremental-refresh shape at 100 TB);
* every estimate is **deterministic cross-engine** — bucket hashing is
  the first-8-md5-hex-chars integer used across this codebase, so a SQL
  oracle replays the sketch bit-for-bit (unlike Spark's built-in binary
  ``count_min_sketch`` whose serialized form is engine-private).

Reference framing: Samza jobs keep exactly this kind of bounded
aggregate state in a KeyValueStore updated per message
(samza-kv/.../KeyValueStore.java); the d×w cell table IS that store,
and the streaming form increments it per micro-batch.

Scale posture: the corpus-sized pass is ONE exact (key, count)
aggregation with map-side partial combine — the same shuffle any
distinct-count pays; the ×depth explosion happens on the *key table*,
never the raw rows, and the sketch itself is d·w rows (constant).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def _read_prior_state(spark: SparkSession, state_path: str) -> DataFrame | None:
    """Read a fold's persisted cell table, returning None ONLY when the
    path genuinely doesn't exist yet (first trigger). Any other read
    error (corrupt file from a crash mid-overwrite, permission, transient
    FS fault) propagates so the trigger FAILS AND RETRIES instead of
    silently resetting accumulated state — the bare ``except Exception``
    this replaces broke the 'streamed == batch bit-for-bit' guarantee on
    exactly the failures that matter (r7 ADVICE)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(state_path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise


def _bucket(key_expr: str, depth_expr: str, width: int, salt: str) -> Column:
    """Row-level bucket for hash row ``depth_expr``: first 8 md5 hex
    chars of 'salt|d|key' as an integer mod width (DuckDB mirror:
    ``('0x' || substr(md5(...), 1, 8))::BIGINT % width``)."""
    return F.expr(
        f"cast(conv(substr(md5(concat('{salt}', '|', cast({depth_expr} as string), "
        f"'|', cast({key_expr} as string))), 1, 8), 16, 10) as bigint) % {width}"
    )


def count_min_table(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 128,
    salt: str = "cm0",
    weight_col: str | None = None,
) -> DataFrame:
    """Build the d×w count-min cell table ``(depth, bucket, c)``.

    Exact key counts first (the only corpus-sized job), then the tiny
    key-count table fans out ×depth.
    """
    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        (
            F.sum(weight_col) if weight_col else F.count(F.lit(1))
        ).alias("c_key")
    )
    fanned = counts.select(
        "k", "c_key", F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("depth")
    )
    return (
        fanned.select(
            "depth",
            _bucket("k", "depth", width, salt).alias("bucket"),
            "c_key",
        )
        .groupBy("depth", "bucket")
        .agg(F.sum("c_key").alias("c"))
    )


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum — count-min linearity. ``merge(sk(A), sk(B)) ==
    sk(A ∪ B)`` exactly (both are integer sums of the same terms)."""
    it = iter(sketches)
    u = next(it)
    for s in it:
        u = u.unionByName(s)
    return u.groupBy("depth", "bucket").agg(F.sum("c").alias("c"))


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 128,
    salt: str = "cm0",
) -> DataFrame:
    """Point estimates for ``probes[key_col]``: min over the d cells each
    key hashes into. The sketch is d·w rows — broadcast it; the probe
    pass is then shuffle-free on the probe side."""
    keyed = probes.select(F.col(key_col).alias("k")).distinct()
    fanned = keyed.select(
        "k", F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("depth")
    ).select("k", "depth", _bucket("k", "depth", width, salt).alias("bucket"))
    joined = fanned.join(F.broadcast(sketch), ["depth", "bucket"], "left").select(
        "k", F.coalesce("c", F.lit(0)).alias("cell")
    )
    return joined.groupBy("k").agg(F.min("cell").alias("cm_estimate"))


def streaming_count_min(
    stream_df: DataFrame,
    key_col: str,
    state_path: str,
    depth: int = 4,
    width: int = 128,
    salt: str = "cm0",
    checkpoint_dir: str | None = None,
):
    """Maintain the count-min cell table as streaming state: per
    micro-batch, sketch the batch (``count_min_table`` on batch rows —
    O(|batch|)) and fold it into the durable cell table by cell-wise
    sum. Linearity makes the streamed result EQUAL to the batch sketch
    of everything ingested, bit for bit (tested), independent of batch
    boundaries — the Samza KeyValueStore-per-task aggregation shape
    with the sketch as the store.

    State is d·w rows (constant); it travels through the driver as a
    bounded in-memory list (same discipline as the BPE vocab loop) and
    lands in parquet with an atomic overwrite per trigger. Returns the
    StreamingQuery; read ``state_path`` for the live sketch.
    """

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        inc = count_min_table(
            batch_df, key_col, depth=depth, width=width, salt=salt
        )
        prev = _read_prior_state(spark, state_path)
        merged = count_min_merge(prev, inc) if prev is not None else inc
        # materialize the tiny cell table before overwriting its own input
        rows = [(r["depth"], r["bucket"], r["c"]) for r in merged.collect()]
        out = spark.createDataFrame(rows, "depth int, bucket bigint, c long")
        out.coalesce(1).write.mode("overwrite").parquet(state_path)

    writer = stream_df.writeStream.foreachBatch(fold).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def count_min_inner_product(sk_a: DataFrame, sk_b: DataFrame) -> DataFrame:
    """Equi-join cardinality estimate from two count-min cell tables
    (Cormode & Muthukrishnan §4.3): per depth, the dot product of the
    two sketch rows; the estimate is the MIN over depths. One-sided like
    the point estimate — never underestimates the true join size
    Σ_k a(k)·b(k) — so it is a safe input to join planning (broadcast
    vs shuffle vs salt: see advisor/skew_report).

    Cost: the sketches are d·w rows each — this is a constant-size job,
    independent of either table. Returns one row
    ``(join_size_estimate BIGINT)``.
    """
    joined = (
        sk_a.select("depth", "bucket", F.col("c").alias("ca"))
        .join(
            sk_b.select("depth", "bucket", F.col("c").alias("cb")),
            ["depth", "bucket"],
        )
        .groupBy("depth")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    return joined.agg(F.min("dot").alias("join_size_estimate"))


def kmv_hash(key_expr: str, salt: str = "kmv0") -> Column:
    """Deterministic 48-bit uniform hash for KMV: first 12 md5 hex chars
    (DuckDB: ``('0x' || substr(md5(...), 1, 12))::BIGINT``)."""
    return F.expr(
        f"cast(conv(substr(md5(concat('{salt}', '|', cast({key_expr} as string))), "
        f"1, 12), 16, 10) as bigint)"
    )


def kmv_table(
    df: DataFrame,
    key_col: str,
    group_cols=(),
    k: int = 64,
    salt: str = "kmv0",
) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002) as a
    relational table: per group, the k smallest distinct 48-bit key
    hashes. Deterministic md5 hashing makes the whole sketch — and its
    estimate — **bit-exact cross-engine**, which Spark's HLL binary
    sketches are not; and min-k is exactly mergeable:
    ``min-k(A ∪ B) == min-k(min-k(A) ∪ min-k(B))`` (tested).

    One distinct-key aggregate (the same shuffle a COUNT DISTINCT pays)
    then a rank window over groups bounded at k rows each.
    """
    gcols = list(group_cols)
    hashed = df.select(
        *gcols, kmv_hash(key_col, salt).alias("h")
    ).distinct()
    from pyspark.sql import Window

    if gcols:
        w = Window.partitionBy(*gcols).orderBy("h")
        return (
            hashed.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= k)
            .select(*gcols, "r", "h")
        )
    # global sketch: sort+limit plans as TakeOrderedAndProject —
    # per-partition top-k merged at the driver, never a single-partition
    # window over every distinct hash; the rank window then runs over
    # only k rows
    topk = hashed.orderBy("h").limit(k)
    return topk.withColumn(
        "r", F.row_number().over(Window.partitionBy(F.lit(1)).orderBy("h"))
    ).select("r", "h")


def kmv_estimate(sketch: DataFrame, group_cols=(), k: int = 64) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: with fewer than k
    hashes the count is EXACT (the sketch saw every distinct value);
    otherwise ``(k-1) * 2^48 div h_k`` — integer arithmetic plus one
    integer division, bit-exact cross-engine."""
    gcols = list(group_cols)
    agg = sketch.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max(F.when(F.col("r") == k, F.col("h"))).alias("h_k"),
    )
    return agg.select(
        *gcols,
        F.expr(
            f"case when n_hashes < {k} then n_hashes "
            f"else (({k} - 1) * cast(281474976710656 as bigint)) div h_k end"
        ).alias("distinct_estimate"),
    )


def kmv_set_ops(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = 64
) -> DataFrame:
    """Theta-sketch-style set operations from two global KMV sketches
    (Dasgupta et al., "Theta-Sketch Framework"): Jaccard, union and
    intersection estimates, all integer and bit-exact cross-engine.

    ``min-k(A ∪ B)`` is recovered exactly from the two k-row sketches
    (mergeability), and within that union sample the fraction of hashes
    present in BOTH input sketches estimates the Jaccard similarity;
    ``|A ∩ B| ≈ J · |A ∪ B|``. Every job here runs over ≤ 2k rows —
    the corpus was only touched by the two one-pass sketch builds.

    Returns one row: ``(n_union_hashes, overlap, jaccard_ppm,
    union_estimate, intersect_estimate)``.
    """
    from pyspark.sql import Window

    u = (
        sketch_a.select("h")
        .unionByName(sketch_b.select("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
        .withColumn(
            "r", F.row_number().over(Window.partitionBy(F.lit(1)).orderBy("h"))
        )
    )
    both = (
        u.join(sketch_a.select(F.col("h").alias("ha")), F.col("h") == F.col("ha"), "left")
        .join(sketch_b.select(F.col("h").alias("hb")), F.col("h") == F.col("hb"), "left")
        .select(
            "r",
            "h",
            (F.col("ha").isNotNull() & F.col("hb").isNotNull()).cast("long").alias("in_both"),
        )
    )
    est = kmv_estimate(u, k=k)
    agg = both.agg(
        F.count(F.lit(1)).alias("n_union_hashes"),
        F.sum("in_both").alias("overlap"),
    )
    return (
        agg.crossJoin(F.broadcast(est))
        .select(
            "n_union_hashes",
            "overlap",
            F.expr("(overlap * 1000000) div n_union_hashes").alias("jaccard_ppm"),
            F.col("distinct_estimate").alias("union_estimate"),
            F.expr(
                "(overlap * 1000000) div n_union_hashes * distinct_estimate div 1000000"
            ).alias("intersect_estimate"),
        )
    )


def count_sketch_table(
    df: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 256,
    salt: str = "cs0",
) -> DataFrame:
    """Count-sketch cell table (Charikar-Chen-Farach-Colton 2002):
    each key contributes ``sign(k) * count(k)`` to one of ``width``
    cells per depth. Shares the (depth, bucket, c) schema with the
    count-min table, and like it is LINEAR — ``count_min_merge`` folds
    two count-sketch tables into the sketch of the union exactly, so
    the same streaming fold applies.

    Scale: ONE exact key-count corpus pass (the same shuffle a COUNT
    DISTINCT pays); the x-depth fanout is ONE explode over the key
    table (a d-branch union would re-run the key-count aggregate per
    depth).
    """
    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    b = (
        f"cast(conv(substr(md5(concat('{salt}b', cast(depth as string), '|', "
        f"cast(k as string))), 1, 8), 16, 10) as bigint) % {width}"
    )
    s = (
        f"case when cast(conv(substr(md5(concat('{salt}s', "
        "cast(depth as string), '|', cast(k as string))), 1, 8), 16, 10) "
        "as bigint) % 2 = 0 then 1 else -1 end"
    )
    cells = counts.select(
        "k",
        "n",
        F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("depth"),
    ).select(
        "depth",
        F.expr(b).alias("bucket"),
        (F.expr(s) * F.col("n")).alias("contrib"),
    )
    return cells.groupBy("depth", "bucket").agg(
        F.sum("contrib").alias("c")
    )


def count_sketch_f2_estimate(cells: DataFrame, depth: int = 5) -> DataFrame:
    """Median-over-depths F2 estimate from a count-sketch cell table:
    per-depth sum of squared cells is unbiased; the exact integer
    median (rank (d+1)/2 of d values) tames the variance."""
    per_depth = cells.groupBy("depth").agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("f2_est")
    )
    from pyspark.sql import Window

    ranked = per_depth.select(
        "f2_est",
        F.row_number()
        .over(Window.partitionBy(F.lit(1)).orderBy("f2_est"))
        .alias("r"),
    )
    return ranked.filter(F.col("r") == (depth + 1) // 2).select(
        F.col("f2_est").alias("f2_estimate")
    )


def count_sketch_f2(
    df: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 256,
    salt: str = "cs0",
) -> DataFrame:
    """Count-sketch second-moment (F2) estimation: the unbiased
    signed-cell estimator of F2 = sum_k n_k^2 — the SELF-join size,
    the other cardinality the join planner needs beside count-min's
    one-sided cross-join bound (signs cancel collisions in
    expectation). Everything is md5-derived and integer, so sketch AND
    estimate cross engines bit-for-bit; the exact F2 is emitted beside
    the estimate with the error in ppm.
    """
    cell_tbl = count_sketch_table(df, key_col, depth=depth, width=width, salt=salt)
    est = count_sketch_f2_estimate(cell_tbl, depth=depth)
    exact = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    ).agg(
        F.sum(F.col("n") * F.col("n")).cast("long").alias("f2_exact")
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "f2_exact",
        "f2_estimate",
        F.expr(
            "(abs(f2_estimate - f2_exact) * 1000000) div f2_exact"
        ).alias("err_ppm"),
    )


def streaming_count_sketch(
    stream_df: DataFrame,
    key_col: str,
    state_path: str,
    depth: int = 5,
    width: int = 256,
    salt: str = "cs0",
    checkpoint_dir: "str | None" = None,
):
    """Maintain the count-sketch cell table as streaming state —
    identical fold discipline to :func:`streaming_count_min` (the
    tables share schema and linearity): per micro-batch, sketch the
    batch and cell-wise-sum it into the durable table; the streamed
    state EQUALS the batch sketch of everything ingested bit for bit,
    independent of batch boundaries (tested)."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        inc = count_sketch_table(
            batch_df, key_col, depth=depth, width=width, salt=salt
        )
        prev = _read_prior_state(spark, state_path)
        merged = count_min_merge(prev, inc) if prev is not None else inc
        rows = [(r["depth"], r["bucket"], r["c"]) for r in merged.collect()]
        out = spark.createDataFrame(rows, "depth int, bucket bigint, c long")
        out.coalesce(1).write.mode("overwrite").parquet(state_path)

    writer = stream_df.writeStream.foreachBatch(fold).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


# ---------------------------------------------------------------------------
# mergeable integer-histogram quantile sketch
# ---------------------------------------------------------------------------
#
# The quantile member of the mergeable-state family (beside count-min /
# count-sketch / KMV): a fixed-width histogram over micro-fixed-point
# values. Unlike t-digest/KLL its cells are pure integers with NO
# merge-order or randomness dependence — merge is cell-wise sum (exactly
# linear, like count-min), so per-shard histograms roll up with no
# rescan and the streamed fold equals the batch build bit-for-bit. The
# estimate error is bounded by one bin width (the caller picks the
# resolution/size trade; cells are at most value_range/bin_width rows).


def hist_table(
    df: DataFrame,
    value_expr: str,
    bin_width: int,
    group_cols=(),
    weight_expr: "str | None" = None,
) -> DataFrame:
    """Build the histogram cell table ``(*group_cols, bin, c)``.
    ``value_expr`` must be an integer SQL expression (fixed-point the
    caller's doubles with the round(x*1e6) primitive); ``bin`` is the
    truncating integer division ``value div bin_width`` (DuckDB mirror
    ``//`` — both truncate toward zero). ``weight_expr`` (integer)
    makes it a weighted histogram — token counts, bytes, revenue cents
    — and the weighted quantiles come out of the same hist_quantiles.
    One map-side-combinable aggregate; cell count is bounded by the
    value range, not the data."""
    gcols = list(group_cols)
    w = (
        F.count(F.lit(1))
        if weight_expr is None
        else F.sum(F.col("__wexpr").cast("long"))
    )
    return (
        df.select(
            *gcols,
            F.expr(f"cast(({value_expr}) div {int(bin_width)} as bigint)").alias(
                "bin"
            ),
            *([] if weight_expr is None else [F.expr(weight_expr).alias("__wexpr")]),
        )
        .groupBy(*gcols, "bin")
        .agg(w.alias("c"))
    )


def hist_merge(*hists: DataFrame) -> DataFrame:
    """Cell-wise sum — histograms are linear, so any grouping/order of
    merges yields the identical table (the matview/rollup contract)."""
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    gcols = [c for c in out.columns if c not in ("c",)]
    return out.groupBy(*gcols).agg(F.sum("c").alias("c"))


def hist_quantiles(
    hist: DataFrame,
    qs_ppm,
    bin_width: int,
    group_cols=(),
) -> DataFrame:
    """Quantile estimates from a histogram: for each q (in ppm), the
    upper edge of the first bin whose cumulative count reaches
    ``ceil(q * total / 1e6)`` — the classic histogram quantile with a
    one-bin-width error bound, all integer arithmetic so any engine
    reproduces it. The rank window runs over the CELL table (bounded),
    never the data."""
    from pyspark.sql import Window

    gcols = list(group_cols)
    w = (
        Window.partitionBy(*gcols).orderBy("bin")
        if gcols
        else Window.partitionBy(F.lit(1)).orderBy("bin")
    )
    cum = hist.withColumn("cum", F.sum("c").over(w)).withColumn(
        "total", F.sum("c").over(Window.partitionBy(*gcols) if gcols else Window.partitionBy(F.lit(1)))
    )
    qdf = None
    for q in qs_ppm:
        # target rank: ceil(q * total / 1e6) as pure integer arithmetic
        hit = (
            cum.filter(
                F.col("cum") * 1_000_000 >= F.lit(int(q)) * F.col("total")
            )
            .groupBy(*gcols)
            .agg(F.min("bin").alias("bin"))
            .select(
                *gcols,
                F.lit(int(q)).alias("q_ppm"),
                ((F.col("bin") + 1) * F.lit(int(bin_width))).alias("value_upper"),
            )
        )
        qdf = hit if qdf is None else qdf.unionByName(hit)
    return qdf


def streaming_histogram(
    stream_df: DataFrame,
    value_expr: str,
    state_path: str,
    bin_width: int,
    checkpoint_dir: "str | None" = None,
):
    """Maintain the histogram as streaming state: sketch each
    micro-batch, fold by cell-wise sum into the durable cell table
    (linearity => streamed == batch over everything ingested, bit for
    bit, independent of batch boundaries — same contract and driver
    discipline as streaming_count_min)."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        inc = hist_table(batch_df, value_expr, bin_width)
        prev = _read_prior_state(spark, state_path)
        merged = hist_merge(prev, inc) if prev is not None else inc
        rows = [(r["bin"], r["c"]) for r in merged.collect()]
        out = spark.createDataFrame(rows, "bin bigint, c long")
        out.coalesce(1).write.mode("overwrite").parquet(state_path)

    writer = stream_df.writeStream.foreachBatch(fold).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def hist_ks(
    hist_a: DataFrame, hist_b: DataFrame, bin_width: int = 1
) -> DataFrame:
    """Two-sample KS **and** earth-mover drift between two HISTOGRAM
    SKETCHES — the monitoring composition that compares a reference
    window's persisted cells against the live fold WITHOUT rescanning
    either corpus (raw-data twins: the ks_drift / emd_drift queries).
    Exact at bin granularity over the union of bins, both from the same
    cumulative walk:

    * ``ks_ppm``  = 1e6 · max|cumA·nB − cumB·nA| // (nA·nB)
    * ``emd_scaled`` = Σ|cumA·nB − cumB·nA| · bin_width // (nA·nB) —
      Wasserstein-1 in the histogram's value units (magnitude-aware
      where KS only sees the worst bin).

    Pure integer numerators, divisions last; every stage runs on the
    cell tables. The cumulative gap products and both scalings run in
    decimal(38,0) (still whole-stage codegen), so nothing wraps below
    the int64 OUTPUT bound.

    Range note (exact envelopes, per column): the per-bin gap is
    ≤ nA·nB, so ``d_num`` (BIGINT output) is exact while nA·nB < 2^63 —
    ~3e9 rows per side; ``emd_num`` sums the gap over B occupied bins,
    so its BIGINT output needs B·nA·nB < 2^63. ``ks_ppm`` /
    ``emd_scaled`` are computed in decimal(38,0) and are bounded by
    1e6 / B·bin_width regardless of n, so they never overflow within
    those envelopes. Beyond ~3e9 rows per side, downscale both
    histograms by a common factor first (both statistics are invariant
    to common scaling of the counts; cell-wise ``c div k`` keeps the
    merge property)."""
    from pyspark.sql import Window

    a = hist_a.select("bin", F.col("c").alias("ca"))
    b = hist_b.select("bin", F.col("c").alias("cb"))
    u = (
        a.join(b, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
        )
    )
    w = Window.partitionBy(F.lit(1)).orderBy("bin")
    wg = Window.partitionBy(F.lit(1))
    cum = (
        u.withColumn("cum_a", F.sum("ca").over(w))
        .withColumn("cum_b", F.sum("cb").over(w))
        .withColumn("n_a", F.sum("ca").over(wg))
        .withColumn("n_b", F.sum("cb").over(wg))
    )
    # gap in decimal(38,0): cum·n products reach nA·nB, which wraps int64
    # at ~3e9 rows/side; the *1e6 / *bin_width scalings would wrap at a
    # mere ~4e6 rows/side in BIGINT (r7 ADVICE) — decimal keeps every
    # intermediate exact far past any realistic window.
    gap = F.abs(
        F.col("cum_a").cast("decimal(38,0)") * F.col("n_b")
        - F.col("cum_b").cast("decimal(38,0)") * F.col("n_a")
    )
    return cum.agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.max(gap).alias("d_num_dec"),
        F.sum(gap).alias("emd_num_dec"),
    ).select(
        "n_a",
        "n_b",
        F.col("d_num_dec").cast("long").alias("d_num"),
        F.expr(
            "cast(d_num_dec * 1000000 div "
            "(cast(n_a as decimal(38,0)) * n_b) as bigint)"
        ).alias("ks_ppm"),
        F.col("emd_num_dec").cast("long").alias("emd_num"),
        F.expr(
            f"cast(emd_num_dec * {int(bin_width)} div "
            "(cast(n_a as decimal(38,0)) * n_b) as bigint)"
        ).alias("emd_scaled"),
    )


def streaming_hll(
    stream_df: DataFrame,
    key_expr: str,
    state_path: str,
    lg_k: int = 12,
    group_col: "str | None" = None,
    checkpoint_dir: "str | None" = None,
    max_groups: int = 100_000,
):
    """Maintain HLL distinct-count sketches as streaming state: sketch
    each micro-batch with ``hll_sketch_agg`` and fold into the durable
    per-group sketch via ``hll_union_agg`` — sketch-union associativity
    makes the streamed sketch EQUAL to the batch sketch of everything
    ingested (same estimate, tested), independent of batch boundaries.
    Completes the mergeable-fold family beside streaming_count_min /
    streaming_count_sketch / streaming_histogram; this is the
    streaming-matview shape for "distinct users per key, live" at any
    scale: state is one binary sketch row per group.

    State rows travel through the driver as a bounded list (one row per
    group) and land in parquet with an atomic overwrite per trigger.
    ``max_groups`` caps that list (same guard discipline as dedup's
    hot-bucket census): a group key whose cardinality grows with the
    data — user_id instead of a categorical — would otherwise OOM the
    driver silently; past the cap the trigger fails with a clear error
    naming the fix (coarser group key, or raise the cap deliberately).
    Genuine read errors on prior state propagate (the trigger retries);
    only the missing-path first trigger starts fresh.
    """
    gcols = [group_col] if group_col else []

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        inc = batch_df.groupBy(*gcols).agg(
            F.hll_sketch_agg(F.expr(key_expr), lg_k).alias("sk")
        )
        prev = _read_prior_state(spark, state_path)
        if prev is not None:
            both = prev.select(*gcols, "sk").unionByName(
                inc.select(*gcols, "sk")
            )
            merged = both.groupBy(*gcols).agg(
                F.hll_union_agg("sk").alias("sk")
            )
        else:
            merged = inc
        # limit-probe: one job, and the driver never holds more than
        # max_groups+1 rows even on the failing trigger
        rows = merged.limit(max_groups + 1).collect()
        if len(rows) > max_groups:
            raise ValueError(
                f"streaming_hll state exceeds the max_groups="
                f"{max_groups} driver-collect cap. The group key's "
                "cardinality scales with the data — use a coarser key "
                "(sketch state must stay bounded), or raise max_groups "
                "deliberately if the driver can hold it."
            )
        out = spark.createDataFrame(rows, merged.schema)
        out.coalesce(1).write.mode("overwrite").parquet(state_path)

    writer = stream_df.writeStream.foreachBatch(fold).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def streaming_heavy_hitters(
    stream_df: DataFrame,
    key_col: str,
    state_path: str,
    k: int = 64,
    checkpoint_dir: "str | None" = None,
):
    """Maintain a Misra-Gries top-k summary as streaming state — the
    bounded-memory heavy-hitters fold beside streaming_count_min /
    streaming_hll: per trigger, the batch's EXACT per-key counts merge
    into the ≤k carried counters, and when the merge exceeds k entries
    every counter is decremented by the (k+1)-largest count and
    non-positive counters drop (the mergeable-summaries MG merge,
    Agarwal et al. PODS'12). Invariants, independent of batch
    boundaries:

    * every retained estimate UNDERCOUNTS its true frequency by at most
      ``n_total / (k+1)`` (n_total = rows ingested so far), and
    * any key with true frequency > ``n_total / (k+1)`` is guaranteed
      present — the heavy hitters cannot be evicted.

    Unlike the linear sketches the summary is order-dependent (two
    ingestion orders give different counter values), so the test pins
    the GUARANTEES against exact batch counts, not byte equality.

    Per trigger: one distributed groupBy for batch counts, a
    TakeOrdered(k+1) for the trim threshold, ≤k state rows through the
    driver (the bounded-list discipline). n_total rides along as a
    meta row — distinguished by ``is_meta = 1``, never by key value,
    so a real key equal to the sentinel string cannot collide.
    """

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        inc = (
            batch_df.select(
                F.expr(key_col).cast("string").alias("key")
            )
            .groupBy("key")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .withColumn("is_meta", F.lit(0))
        )
        n_batch = batch_df.count()
        prev = _read_prior_state(spark, state_path)
        n_prev = 0
        if prev is not None:
            n_prev = prev.filter(F.col("is_meta") == 1).collect()[0]["c"]
            both = prev.filter(F.col("is_meta") == 0).unionByName(inc)
            merged = both.groupBy("key").agg(
                F.sum("c").cast("long").alias("c")
            )
        else:
            merged = inc.select("key", "c")
        # MG trim: keep k largest after subtracting the (k+1)-th count
        top = merged.orderBy(
            F.col("c").desc(), F.col("key")
        ).limit(k + 1).collect()
        if len(top) > k:
            cut = top[k]["c"]
            kept = [
                (r["key"], r["c"] - cut, 0)
                for r in top[:k]
                if r["c"] - cut > 0
            ]
        else:
            kept = [(r["key"], r["c"], 0) for r in top]
        kept.append(("__n_total__", n_prev + n_batch, 1))
        out = spark.createDataFrame(
            kept, "key string, c long, is_meta int"
        )
        out.coalesce(1).write.mode("overwrite").parquet(state_path)

    writer = stream_df.writeStream.foreachBatch(fold).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
