"""Corpus governance: per-source (domain) statistics and caps.

Web-scale training corpora are governed at the *source* level — a domain
that contributes 40% of the crawl must not contribute 40% of the
training set. The two public patterns (used by C4, RefinedWeb, Dolma):

- **source profiling**: per-domain document counts, token volume, and
  quality distribution, to decide mixture weights;
- **per-source caps**: keep at most K documents per domain, picking the
  highest-quality ones deterministically.

Both are expressed as pure Catalyst plans. The cap supports a two-phase
(salted) top-K for hot domains: phase 1 ranks within (source, salt) and
keeps K per salt group, phase 2 ranks the survivors within source — the
final top-K is provably identical to the single-phase rank (any row in
the global per-source top-K is in the top-K of its salt group), but no
single task ever sorts more than (domain size / n_salts) rows. That is
the standard skew treatment for windowed top-K at 100 TB, where one hot
domain would otherwise serialize into one straggler task.

Reference anchor: per-key aggregation + rank is the partitionBy +
aggregate + window composition of the reference DSL
(samza-api/.../operators/MessageStream.java:50, Windows.java); the
governance framing is the training-pipeline capability built on it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from samza_spark.pipeline.text import quality_score, token_count


def source_stats(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source corpus profile:
    ``(source, n_docs, n_langs, n_tokens, n_chars, mean_quality, min_doc_id)``.

    Integer metrics are exact sums (shuffle-order-free); ``mean_quality``
    folds the per-doc quality doubles in id order (array fold, not a
    shuffle-order SUM) so a DuckDB oracle reproduces the double
    bit-for-bit. One groupBy shuffle on the source key; map-side partial
    aggregation applies to every metric except the ordered fold, whose
    state is one (id, double) pair per doc — same scale shape as any
    per-key collect with bounded group size; for unbounded groups use the
    plain AVG (order-dependent, not oracle-exact).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    per_doc = df.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("__id"),
        F.col(lang_col).alias("__lang"),
        token_count(t).cast("long").alias("__ntok"),
        F.length(t).cast("long").alias("__nchar"),
        quality_score(t).alias("__q"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("__lang").cast("long").alias("n_langs"),
        F.sum("__ntok").cast("long").alias("n_tokens"),
        F.sum("__nchar").cast("long").alias("n_chars"),
        (
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__id", "__q"))),
                    lambda s: s["__q"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_quality"),
        F.min("__id").alias("min_doc_id"),
    )


def _rank_in(partition_cols: list, quality: Column, id_col: str) -> Column:
    w = Window.partitionBy(*partition_cols).orderBy(
        F.desc("__q"), F.asc(F.col(id_col))
    )
    return F.row_number().over(w)


def cap_per_source(
    df: DataFrame,
    max_docs: int = 10,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    quality: Column | None = None,
    n_salts: int = 1,
) -> DataFrame:
    """Keep at most ``max_docs`` documents per source, the highest
    ``quality`` first (ties broken by ascending id — fully
    deterministic). Returns the kept rows of ``df`` plus ``quality`` and
    the 1-based ``src_rank``.

    ``n_salts > 1`` switches to the two-phase skew-safe plan: rank within
    (source, md5-salt of id) keeping ``max_docs`` per salt group, then
    re-rank the <= max_docs * n_salts survivors within source. The result
    is identical to the single-phase window (the global per-source top-K
    is a subset of every salt-group top-K union), but the heavy sort is
    split across ``n_salts`` tasks per hot source.
    """
    if quality is None:
        quality = quality_score(F.coalesce(F.col(text_col), F.lit("")))
    ranked = df.withColumn("__q", quality)
    if n_salts > 1:
        salt = F.expr(
            f"cast(conv(substr(md5(cast({id_col} as string)), 1, 8), 16, 10) "
            f"as bigint) % {n_salts}"
        )
        ranked = (
            ranked.withColumn("__salt", salt)
            .withColumn("__r1", _rank_in([source_col, "__salt"], quality, id_col))
            .filter(F.col("__r1") <= max_docs)
            .drop("__salt", "__r1")
        )
    return (
        ranked.withColumn("src_rank", _rank_in([source_col], quality, id_col))
        .filter(F.col("src_rank") <= max_docs)
        .withColumnRenamed("__q", "quality")
    )


def token_mixture_plan(
    df: DataFrame,
    target_weights,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    granularity: int = 10_000,
) -> DataFrame:
    """Token-weighted mixture planning (the budgeting step of DoReMi /
    Pile-style source weighting, with tokens — not documents — as the
    unit that actually matters for training): given target shares in
    parts of ``granularity`` (e.g. 4000 = 40%), find the largest total
    token budget T every source can serve WITHOUT upsampling,

        T = min_g (tokens_g * granularity) div w_g,

    and each source's keep rate ``rate_bp = (w_g * T) div tokens_g``.
    All arithmetic uses true INTEGER division (Spark ``div``, DuckDB
    ``//`` in the oracle — ``floor(a/b)`` on bigints is double division
    first, which can diverge from exact integer division beyond ~2^53),
    so the plan is bit-reproducible across engines while every
    intermediate product fits in int64: n_tokens * granularity < 2^63,
    i.e. ~9e14 tokens at the default granularity — three orders of
    magnitude above a 100 TB corpus (~2.5e13 tokens). Returns one row
    per targeted source:
    ``(source, n_docs, n_tokens, target_bp, rate_bp, planned_tokens)``
    with ``planned_tokens = (n_tokens * rate_bp) div granularity``
    (the expected token yield of hash-sampling at that rate).

    Scale: one groupBy shuffle on the source key; the output is
    sources-sized (broadcastable into :func:`apply_mixture_plan`).
    """
    if not target_weights:
        raise ValueError("target_weights must be non-empty")
    if sum(target_weights.values()) > granularity:
        raise ValueError("target weights exceed granularity (over 100%)")
    w_expr = F.coalesce(
        *[
            F.when(F.col(source_col) == s, F.lit(w))
            for s, w in sorted(target_weights.items())
        ]
    )
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = (
        df.where(F.col(source_col).isin(list(target_weights)))
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(token_count(t)).cast("long").alias("n_tokens"),
        )
        .withColumn("target_bp", w_expr.cast("long"))
    )
    total = counts.agg(
        F.min(
            F.expr(f"(n_tokens * {int(granularity)}) div target_bp")
        ).alias("__t")
    )
    return counts.join(F.broadcast(total)).select(
        source_col,
        "n_docs",
        "n_tokens",
        "target_bp",
        F.expr("(target_bp * __t) div n_tokens").cast("long").alias("rate_bp"),
        F.expr(
            f"(n_tokens * ((target_bp * __t) div n_tokens)) div {int(granularity)}"
        )
        .cast("long")
        .alias("planned_tokens"),
    )


def apply_mixture_plan(
    df: DataFrame,
    plan: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix0",
    granularity: int = 10_000,
) -> DataFrame:
    """Execute a :func:`token_mixture_plan`: keep each source's
    deterministic md5-hash sample at its planned rate. Map-side filter
    after one broadcast join — the same engine-reproducible mechanism as
    ``sampling.mixture_resample``, driven by token-weighted rates."""
    bucket = F.expr(
        f"cast(conv(substr(md5(concat('{salt}', '|', cast({id_col} as string))), 1, 8), 16, 10) "
        f"as bigint) % {granularity}"
    )
    return (
        df.join(F.broadcast(plan.select(source_col, "rate_bp")), on=source_col)
        .where(bucket < F.col("rate_bp"))
    )


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 20,
) -> DataFrame:
    """Join/aggregation-key skew diagnostic — the report to run BEFORE
    keying a 100 TB shuffle on a column: per-key row counts for the
    ``top_n`` heaviest keys with integer parts-per-million share and
    cumulative share (a key with share_ppm > ~1e6/num_partitions will
    straggle one reducer; the mitigation is salting — see
    ``cap_per_source``/``graph.pagerank_exact(n_salts=...)``).

    Plan shape: ONE map-side-combinable count aggregate, a scalar total
    broadcast, TakeOrderedAndProject for the top-N (no global sort), and
    a window over the N surviving rows only. All arithmetic integer —
    engine-reproducible.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("__total"))
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col(key_col).asc())
        .limit(int(top_n))
        .join(F.broadcast(total))
        .select(
            key_col,
            "cnt",
            F.expr("cast(cnt * 1000000 div __total as bigint)").alias("share_ppm"),
            "__total",
        )
    )
    # the global window runs over the <= top_n post-limit rows only (the
    # same benign shape as bm25's final rank) — never over the corpus
    return (
        top.withColumn("rank", F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), F.col(key_col).asc())
        ).cast("int"))
        .withColumn(
            "cum_share_ppm",
            F.expr("cast(sum(cnt) over (order by cnt desc, {k} asc "
                   "rows between unbounded preceding and current row) "
                   "* 1000000 div __total as bigint)".format(k=key_col)),
        )
        .drop("__total")
    )


def temperature_mixture(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    granularity: int = 1_000_000,
) -> DataFrame:
    """Temperature-based source weighting at alpha = 1/2 (the
    multilingual-LM sampling rule p_g ∝ n_g^alpha — upweights tail
    sources relative to their natural share; alpha=1/2 is the common
    default and the one exponent whose power, ``sqrt``, is an IEEE
    correctly-rounded op, so the plan is bit-reproducible without a
    transcendental ``pow``).

    Determinism: per-source token counts are integer; ``w_g = sqrt(n_g)``
    is one exact-rounded op; the denominator folds the (few) per-source
    weights in SOURCE ORDER via a sequential array fold (a cross-row
    double ``sum()`` would be shuffle-order-dependent); each share is
    then one division + one floor to integer ppm.

    Scale: one token aggregate keyed by source (map-side combinable) —
    the output is sources-sized and broadcastable. Returns
    ``(source, n_tokens, natural_ppm, temp_ppm)`` contrasting the natural
    share with the temperature share.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    per = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(token_count(t)).cast("long").alias("n_tokens")
    )
    tot = F.broadcast(
        per.agg(
            F.sum("n_tokens").alias("__tot"),
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(source, n_tokens))), "
                "s -> sqrt(cast(s.n_tokens as double))), cast(0.0 as double), "
                "(acc, v) -> acc + v)"
            ).alias("__wsum"),
        )
    )
    g = int(granularity)
    return (
        per.join(tot)
        .select(
            "source",
            "n_tokens",
            F.expr(f"n_tokens * {g} div __tot").alias("natural_ppm"),
            F.expr(
                f"cast(floor({g}.0 * (sqrt(cast(n_tokens as double)) / __wsum)) as bigint)"
            ).alias("temp_ppm"),
        )
    )


def quality_calibration(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    granularity: int = 1_000_000,
) -> DataFrame:
    """Per-source quality percentile (integer ppm): rank each document's
    quality WITHIN its source — the calibration step before applying one
    global quality threshold to heterogeneous sources (a fixed cutoff
    keeps 90% of clean encyclopedia text and 4% of forum text; per-source
    percentiles make "drop the worst decile of each source" expressible).

    Only the rank crosses engines — the score's doubles never need to be
    compared, just totally ordered, and both engines order identical
    doubles identically ((score ASC, id ASC) tie-break). One
    source-partitioned rank window + count — no global sort. Returns
    ``(id_col, source, pctile_ppm)`` where
    ``pctile_ppm = (rank - 1) * granularity div (n - 1)`` (0 for
    singleton sources).
    """
    q = quality_score(F.coalesce(F.col(text_col), F.lit("")))
    w = Window.partitionBy(source_col).orderBy(q.asc(), F.col(id_col).asc())
    g = int(granularity)
    return (
        df.select(
            F.col(id_col),
            F.col(source_col).alias("source"),
            F.row_number().over(w).alias("__r"),
            F.count(F.lit(1)).over(Window.partitionBy(source_col)).alias("__n"),
        )
        .select(
            id_col,
            "source",
            F.expr(
                f"if(__n > 1, (__r - 1) * {g} div (__n - 1), 0)"
            ).alias("pctile_ppm"),
        )
    )


def cross_source_dup_matrix(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    max_sources_per_fp: int = 64,
    prefix_words: "int | None" = None,
) -> DataFrame:
    """Cross-source duplicate matrix: for every source pair (a < b), how
    many distinct content fingerprints occur in BOTH — the syndication/
    mirror audit that decides which source to keep when two feeds carry
    the same articles (complements ``source_overlap``'s vocabulary
    Jaccard with document-identity evidence). ``prefix_words`` coarsens
    the fingerprint to the first N normalized words (the lede — catches
    syndicated copies whose bodies diverge after the opening); ``None``
    fingerprints the full text.

    One fingerprint projection, one fp-keyed distinct + collect_set (the
    same bounded in-group pair expansion as LSH buckets, capped at
    ``max_sources_per_fp``), one pair-keyed count — shuffle volume is
    fingerprints, not documents. Returns ``(src_a, src_b, n_dup_fps)``.
    """
    norm = F.trim(
        F.regexp_replace(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " "
        )
    )
    if prefix_words is not None:
        content = F.array_join(
            F.slice(F.split(norm, " "), 1, int(prefix_words)), " "
        )
    else:
        content = norm
    fps = (
        df.select(
            F.md5(content).alias("fp"),
            F.col(source_col).alias("s"),
        )
        .distinct()
        .groupBy("fp")
        .agg(F.array_sort(F.collect_set("s")).alias("ss"))
    )
    pair_expr = (
        "if(size(ss) between 2 and {cap}, "
        "flatten(transform(sequence(1, size(ss) - 1), i -> "
        "transform(sequence(0, i - 1), j -> struct(ss[j] AS a, ss[i] AS b)))), "
        "array())"
    ).format(cap=int(max_sources_per_fp))
    return (
        fps.select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy(F.col("p.a").alias("src_a"), F.col("p.b").alias("src_b"))
        .agg(F.count(F.lit(1)).alias("n_dup_fps"))
    )


def blocklist_filter(
    df: DataFrame,
    col: str,
    exact: "DataFrame | list | None" = None,
    patterns: "list[str] | None" = None,
    flag_col: str | None = None,
) -> DataFrame:
    """Blocklist curation (the C4/RefinedWeb domain-exclusion stage):
    drop rows whose ``col`` matches a blocklist, split into the two
    shapes real blocklists have:

    - **exact entries** (potentially millions of domains): a broadcast
      hash ANTI join — the list ships once per executor, the corpus
      side stays map-only, no corpus shuffle;
    - **wildcard patterns** (a handful, e.g. ``ads.*``): compiled into
      ONE anchored regex alternation evaluated map-side (``*`` matches
      any run, everything else is escaped literally). An OR-of-LIKEs
      join would plan as a nested loop; a single RE2-safe alternation
      is a constant-cost row filter.

    ``flag_col`` switches from filtering to annotating (a ``blocked``
    boolean) so audits can count what WOULD drop.
    """
    import re as _re

    spark = df.sparkSession
    blocked = F.lit(False)
    out = df
    if patterns:
        parts = []
        for p in patterns:
            parts.append("".join(".*" if ch == "*" else _re.escape(ch) for ch in p))
        rx = "^(?:" + "|".join(parts) + ")$"
        blocked = blocked | F.col(col).rlike(rx)
    if exact is not None:
        if not isinstance(exact, DataFrame):
            exact = spark.createDataFrame([(e,) for e in exact], f"__bl string")
        else:
            exact = exact.select(F.col(exact.columns[0]).alias("__bl"))
        if flag_col is None and not patterns:
            # pure exact case: let Catalyst plan the anti join directly
            return df.join(
                F.broadcast(exact), df[col] == F.col("__bl"), "left_anti"
            )
        out = df.join(
            F.broadcast(exact), df[col] == F.col("__bl"), "left"
        )
        blocked = blocked | F.col("__bl").isNotNull()
    if flag_col is not None:
        return out.withColumn(flag_col, blocked).drop("__bl") if exact is not None \
            else out.withColumn(flag_col, blocked)
    out = out.filter(~blocked)
    return out.drop("__bl") if exact is not None else out


def mixing_schedule(
    weights: DataFrame,
    n_steps: int,
    source_col: str = "source",
    weight_col: str = "weight",
) -> DataFrame:
    """Deterministic interleaved training-mix schedule: turn per-source
    mixture weights into an explicit (step, source, k) sequence of
    ``n_steps`` draws where source ``s`` receives ``c_s = (w_s *
    n_steps) div Σw`` slots spread EVENLY through the run (the
    low-discrepancy interleave a data loader wants — not front-loaded,
    not random). Slot k of source s sits at fractional position
    (2k-1)/(2c_s); ordering those positions is done on the integer key

        key = ((2k-1) * 1_000_000_000) div c_s

    (ties broken by source, k) so the schedule is bit-identical in any
    engine. The global step number is operators.rank.global_rank —
    range exchange + broadcast offsets, no single-partition sort — so a
    multi-billion-step schedule materializes scalably. Rounding slack
    (Σc_s ≤ n_steps) is reported by the caller comparing max(step) to
    n_steps; weights-sized inputs mean the expansion is the only big
    stage and it is embarrassingly parallel.

    Returns (step, source, k) with step 1..Σc_s.
    """
    from samza_spark.operators.rank import global_rank

    total = weights.agg(F.sum(F.col(weight_col)).alias("t")).collect()[0]["t"]
    slots = weights.select(
        F.col(source_col).alias("source"),
        F.expr(f"(cast({weight_col} as bigint) * {int(n_steps)}) div {int(total)}").alias(
            "__c"
        ),
    ).filter(F.col("__c") > 0)
    expanded = slots.select(
        "source",
        "__c",
        F.explode(F.expr("sequence(1, __c)")).alias("k"),
    ).select(
        "source",
        "k",
        F.expr("((2 * k - 1) * 1000000000) div __c").alias("__key"),
    )
    ranked = global_rank(
        expanded, [F.asc("__key"), F.asc("source"), F.asc("k")], rank_col="step"
    )
    return ranked.select("step", "source", F.col("k").cast("long").alias("k"))


def quantile_normalize(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quantile-normalize a per-group value onto the GLOBAL value
    distribution: each row's within-group percentile rank is mapped to
    the global order statistic at the same percentile, so every group
    ends up with an identical (the corpus-wide) distribution. The
    standard cross-source score-calibration transform when sources
    score on incomparable scales — stronger than
    :func:`quality_calibration` (which only emits the percentile) in
    that it returns an actual calibrated VALUE usable downstream.

    Exactness: ranks are integers; the target order statistic index is
    ``1 + ((r - 1) * (N - 1)) div (n_g - 1)`` with INTEGER division
    (single-row groups map to the global median index), and the
    normalized value is fetched by an equi-join on that index — no
    interpolation, no float arithmetic, hashes identically cross-engine.

    Plan: one group-partitioned rank window; the GLOBAL order
    statistics come from :func:`samza_spark.operators.rank.global_rank`
    (range exchange + broadcast offsets — no single-partition sort
    anywhere); the final fetch is an equi-join on the integer index.
    Scale-safe at any corpus size and any group cardinality.
    """
    from samza_spark.operators.rank import global_rank

    base = df.select(
        F.col(id_col), F.col(group_col), F.col(value_col).cast("long").alias("__v")
    )
    wg = Window.partitionBy(group_col).orderBy(F.asc("__v"), F.asc(id_col))
    within = base.select(
        id_col,
        group_col,
        "__v",
        F.row_number().over(wg).alias("__r"),
        F.count(F.lit(1)).over(Window.partitionBy(group_col)).alias("__ng"),
    )
    glob = global_rank(
        base.select(F.col("__v").alias("__gv"), F.col(id_col).alias("__gid")),
        [F.asc("__gv"), F.asc("__gid")],
        rank_col="__gr",
    ).select("__gv", "__gr")
    n_total = base.count()  # one count job; the scalar parameterizes the map
    target = F.when(
        F.col("__ng") > 1,
        F.lit(1) + F.expr(f"((__r - 1) * {int(n_total) - 1}) div (__ng - 1)"),
    ).otherwise(F.lit(1) + F.lit((int(n_total) - 1) // 2)).cast("long")
    return (
        within.withColumn("__t", target)
        .join(glob, F.col("__t") == F.col("__gr"))
        .select(
            id_col,
            group_col,
            F.col("__v").alias(value_col),
            F.col("__r").alias("group_rank"),
            F.col("__gv").alias("normalized"),
        )
    )


def k_anonymity(
    df: DataFrame,
    qi_cols: "list[str]",
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a set of quasi-identifier columns: group
    by the QI tuple and report every equivalence class with its size and
    a ``suppressed`` flag for classes smaller than ``k`` — the rows a
    privacy-preserving release must generalize or drop, since a QI
    combination shared by fewer than k individuals re-identifies them.
    The governance gate run before exporting any event-level dataset.

    One combinable groupBy on the QI tuple — map-side partial counts,
    no window, no join; the class table is at most the QI-domain size.
    """
    counts = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("class_size"))
    return counts.select(
        *qi_cols,
        "class_size",
        (F.col("class_size") < F.lit(int(k))).alias("suppressed"),
    )


def k_anonymity_report(
    df: DataFrame,
    qi_cols: "list[str]",
    k: int = 5,
) -> DataFrame:
    """One-row summary of :func:`k_anonymity`: class counts, suppressed
    class/row counts, and the suppression rate in exact basis points
    (integer div — no float division, hashes identically cross-engine).
    """
    classes = k_anonymity(df, qi_cols, k)
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(F.col("suppressed"), 1).otherwise(0)).alias(
            "suppressed_classes"
        ),
        F.sum("class_size").alias("n_rows"),
        F.sum(F.when(F.col("suppressed"), F.col("class_size")).otherwise(0)).alias(
            "suppressed_rows"
        ),
    ).select(
        "n_classes",
        "suppressed_classes",
        "n_rows",
        "suppressed_rows",
        F.expr("(suppressed_rows * 10000) div n_rows").alias("suppression_bp"),
    )


def abc_classification(
    df: DataFrame,
    source_col: str = "source",
    weight_col: str | None = None,
    a_bp: int = 8000,
    b_bp: int = 9500,
) -> DataFrame:
    """ABC / Pareto classification of sources by volume: sources sorted
    by descending weight, classified A while the RUNNING share (in exact
    basis points, integer division on the cumulative sums) stays within
    ``a_bp``, B up to ``b_bp``, C after — the 80/15/5 inventory analysis
    applied to corpus governance ("which sources do 80% of the
    tokens?"). A source straddling a boundary takes the class of its
    own cumulative position.

    One corpus-scale per-source aggregate; the cumulative runs on the
    source-count-sized table via the range-exchange global cumsum (no
    single-partition window), and the class is a map-side expression.
    """
    from samza_spark.operators.rank import global_cumsum

    w = (
        F.count(F.lit(1)) if weight_col is None else F.sum(F.col(weight_col))
    )
    per_src = df.groupBy(F.col(source_col).alias("s")).agg(w.alias("wt"))
    tot = per_src.agg(F.sum("wt").alias("t"))
    cum = global_cumsum(
        per_src, [F.desc("wt"), F.asc("s")], ["wt"], prefix="cum_"
    )
    out = cum.join(F.broadcast(tot)).select(
        F.col("s").alias(source_col),
        "wt",
        F.col("cum_wt"),
        F.expr("(cum_wt * 10000) div t").alias("cum_bp"),
    )
    return out.select(
        source_col,
        "wt",
        "cum_wt",
        "cum_bp",
        F.when(F.col("cum_bp") <= F.lit(int(a_bp)), F.lit("A"))
        .when(F.col("cum_bp") <= F.lit(int(b_bp)), F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )


def concentration_hhi(
    df: DataFrame,
    group_col: str,
    member_col: str,
) -> DataFrame:
    """Herfindahl-Hirschman concentration index per group: with member
    counts ``c_i`` summing to ``T``, ``HHI = Σ (c_i/T)²`` emitted as the
    exact integer ``(Σ c_i²) · 1e6 div T²`` ppm — 1e6/n for perfectly
    even n members, 1e6 for a monopoly. The dependency-concentration
    audit (one supplier owning a customer's volume, one source owning a
    language) that complements :func:`key_skew_report`'s per-key view
    with a portfolio-level scalar.

    One corpus-scale (group, member) count; the rollup runs on the
    grid. All BIGINT.
    """
    counts = df.groupBy(
        F.col(group_col).alias("g"), F.col(member_col).alias("m")
    ).agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("c").alias("total"),
            F.sum(F.col("c") * F.col("c")).alias("__ss"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_members",
            "total",
            F.expr("(__ss * 1000000) div (total * total)").alias("hhi_ppm"),
        )
    )


def fair_allocation(
    df: DataFrame,
    budget: int,
    source_col: str = "source",
    demand_col: str | None = None,
) -> DataFrame:
    """Max-min fair (water-filling) budget division: give every source
    as much of its demand as possible under a global ``budget``, never
    letting a big source starve small ones — ascending by demand, a
    source is FULLY funded while ``prefix_sum + demand·(n−i)`` fits the
    budget; everyone after gets the integer water level, with the
    division remainder spread one unit each to the first unfunded
    sources so the allocations sum to EXACTLY min(budget, Σdemand).
    The fair-share scheduler of token budgeting (YARN/DRF's single-
    resource case) as one relational plan.

    Demands reduce corpus-scale (one combinable aggregate); ranking and
    the prefix sum ride the range-exchange global rank/cumsum over the
    source-count-sized table; the level/remainder are one broadcast row.
    All-integer, deterministic under the (demand, source) order.
    """
    from samza_spark.operators.rank import global_cumsum, global_rank

    w = (
        F.count(F.lit(1)) if demand_col is None else F.sum(F.col(demand_col))
    )
    demands = df.groupBy(F.col(source_col).alias("s")).agg(
        w.cast("long").alias("d")
    )
    ranked = global_rank(demands, [F.asc("d"), F.asc("s")], rank_col="i")
    cum = global_cumsum(ranked, [F.asc("d"), F.asc("s")], ["d"], prefix="p_")
    n_total = demands.count()
    b = int(budget)
    funded = cum.withColumn(
        "funded",
        F.col("p_d") + F.col("d") * (F.lit(int(n_total)) - F.col("i"))
        <= F.lit(b),
    )
    sat = funded.filter(F.col("funded")).agg(
        F.coalesce(F.max("i"), F.lit(0)).alias("k"),
        F.coalesce(F.max(F.when(F.col("funded"), F.col("p_d"))), F.lit(0)).alias(
            "pk"
        ),
    )
    level = sat.select(
        "k",
        "pk",
        F.when(
            F.lit(int(n_total)) > F.col("k"),
            F.expr(f"({b} - pk) div ({int(n_total)} - k)"),
        ).otherwise(F.lit(0)).alias("lvl"),
        F.when(
            F.lit(int(n_total)) > F.col("k"),
            F.expr(f"({b} - pk) % ({int(n_total)} - k)"),
        ).otherwise(F.lit(0)).alias("rem"),
    )
    return (
        funded.join(F.broadcast(level))
        .select(
            F.col("s").alias(source_col),
            F.col("d").alias("demand"),
            "funded",
            F.when(F.col("funded"), F.col("d"))
            .otherwise(
                F.least(
                    F.col("d"),
                    F.col("lvl")
                    + (F.col("i") - F.col("k") <= F.col("rem")).cast("long"),
                )
            )
            .alias("alloc"),
        )
    )


# Two-sided geometric (discrete Laplace) CDF thresholds on a 2^30 scale
# for alpha = 1/2 (epsilon = ln 2 per unit sensitivity), support clipped
# to [-8, 8]: P(K = k) = (1/3) * (1/2)^|k|. The values are exact dyadic
# rationals over 3, baked once and shared verbatim with the oracle SQL,
# so the "noise" crosses engines bit-for-bit.
from fractions import Fraction as _Fr

_DGEOM_CDF_Q30 = []
for _j in range(-8, 8):
    if _j < 0:
        _f = _Fr(2, 3) * _Fr(1, 2 ** (-_j))
    else:
        _f = 1 - _Fr(1, 3) * _Fr(1, 2**_j)
    _DGEOM_CDF_Q30.append(int(_f * (1 << 30)))


def _dp_noise_sql(key_expr: str, concat: str, cast_var: str) -> str:
    """Noise expression from the baked thresholds; ``concat``/``cast_var``
    pick the Spark or DuckDB spelling of hash-to-uniform."""
    if cast_var == "spark":
        u = (
            f"(cast(conv(substr(md5(concat('dp|', cast({key_expr} as string))), "
            "1, 8), 16, 10) as bigint) % 1073741824)"
        )
    else:
        u = (
            f"(('0x' || substr(md5('dp|' || CAST({key_expr} AS VARCHAR)), "
            "1, 8))::BIGINT % 1073741824)"
        )
    parts = " + ".join(
        f"(case when {u} >= {t} then 1 else 0 end)" for t in _DGEOM_CDF_Q30
    )
    return f"(({parts}) - 8)"


def dp_histogram(
    df: DataFrame,
    category_cols: "list[str]",
    threshold: int = 3,
) -> DataFrame:
    """Differentially-private histogram release (the Google/Apple-style
    aggregate publication pattern): per-category counts plus two-sided
    geometric noise (discrete Laplace, epsilon = ln 2), then suppression
    of categories whose NOISY count falls below ``threshold`` — the
    standard (eps, delta) thresholded release that also hides the
    existence of rare categories.

    The noise here is hash-deterministic per category (so the release is
    reproducible and the oracle can replay it exactly); a production
    deployment would swap the salt for a secret per-release seed —
    the mechanism, thresholds, and plan shape are identical.

    Scale: ONE combinable count aggregate; the noise is a row-local
    expression over the (small) category table.
    """
    key = "concat_ws('|', " + ", ".join(category_cols) + ")"
    noise = _dp_noise_sql(key, "", "spark")
    counts = df.groupBy(*category_cols).agg(F.count(F.lit(1)).alias("__n"))
    return (
        counts.select(
            *category_cols,
            (F.col("__n") + F.expr(noise)).cast("long").alias("released_count"),
        )
        .filter(F.col("released_count") >= threshold)
    )


def l_diversity(
    df: DataFrame,
    qi_cols: "list[str]",
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007, the k-anonymity
    strengthening): a QI equivalence class is safe only if it contains
    at least ``l`` DISTINCT sensitive values — k-anonymous classes whose
    members all share one diagnosis still leak it. Per class: size,
    distinct sensitive count, and the ``violates`` flag.

    One groupBy on the QI tuple with a two-phase distinct aggregate
    (partials on (qi, sensitive)) — no window, no join; safe at any
    corpus size like :func:`k_anonymity`."""
    return (
        df.groupBy(*qi_cols)
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct(sensitive_col).alias("n_sensitive"),
        )
        .select(
            *qi_cols,
            "class_size",
            "n_sensitive",
            (F.col("n_sensitive") < F.lit(int(l))).alias("violates"),
        )
    )


def t_closeness(
    df: DataFrame,
    qi_cols: "list[str]",
    sensitive_col: str,
    t_ppm: int = 200_000,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007): a class
    leaks when its sensitive-value DISTRIBUTION strays from the global
    one — even an l-diverse class is revealing if one value dominates.
    Per class, the total-variation distance to the global distribution
    in exact ppm: with class size C, corpus size G, per-value counts
    c_v (class) and g_v (global),

        tvd_ppm = 1e6 * Σ_v |c_v·G − g_v·C|  //  (2·C·G)

    — all integer products (≤ 2e16 at 1e5×1e5 scale, inside BIGINT), so
    any engine reproduces the verdict bit-for-bit.

    Shape: one (qi, sensitive) aggregate, one class-size aggregate, the
    tiny global value table cross-joined per class (sensitive domains
    are small by definition — a wide domain isn't a t-closeness use
    case), LEFT join so values ABSENT from a class still contribute
    their full |0 − g_v·C| term. No corpus-sized window anywhere."""
    sv = F.col(sensitive_col)
    cv = df.groupBy(*qi_cols, sv.alias("__v")).agg(
        F.count(F.lit(1)).alias("c_v")
    )
    classes = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("class_size"))
    gv = df.groupBy(sv.alias("__v")).agg(F.count(F.lit(1)).alias("g_v"))
    total = df.agg(F.count(F.lit(1)).alias("__g"))
    grid = classes.crossJoin(F.broadcast(gv)).crossJoin(F.broadcast(total))
    terms = grid.join(cv, [*qi_cols, "__v"], "left").select(
        *qi_cols,
        "class_size",
        "__g",
        F.abs(
            F.coalesce(F.col("c_v"), F.lit(0)) * F.col("__g")
            - F.col("g_v") * F.col("class_size")
        ).alias("term"),
    )
    return (
        terms.groupBy(*qi_cols)
        .agg(
            F.first("class_size").alias("class_size"),
            F.first("__g").alias("__g"),
            F.sum("term").alias("__num"),
        )
        .select(
            *qi_cols,
            "class_size",
            F.expr("(__num * 1000000) div (2 * class_size * __g)").alias(
                "tvd_ppm"
            ),
            (
                F.expr("(__num * 1000000) div (2 * class_size * __g)")
                > F.lit(int(t_ppm))
            ).alias("violates"),
        )
    )


def luhn_audit(
    df: DataFrame,
    token_col: str,
    group_cols: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """Luhn mod-10 checksum audit over candidate numeric tokens — the
    precision layer of a PII scan: a digit-run regex alone flags every
    long number (order ids, timestamps, hashes); the Luhn check digit
    (ISO/IEC 7812, the public checksum every payment-card number
    carries) separates plausibly-real card numbers from digit noise at
    a 10% false-accept floor, which is what decides whether a document
    is quarantined or merely logged.

    The checksum is evaluated as ONE Catalyst higher-order expression
    (aggregate over the token's digit positions — right-to-left
    alternate doubling with the >9 fold), so the audit is map-side
    integer arithmetic with a single tiny groupBy on (group...,
    token length). An unrolled 19-term codegen form was built and
    MEASURED this round (r12, settled interleaved A/B at sf0.1): the
    unroll lost 1.5× (1.74 s vs 1.15 s) — 19 guarded CASE terms with
    repeated length/ascii/substr subtrees generate a worse method than
    the ≤19-step interpreted fold, the §1.2 "ideal plan is slower at
    first" gotcha — so the fold stays. Emits ``(group..., token_len,
    n_tokens, n_valid, valid_ppm)``; non-digit or short (<12) tokens are
    excluded (the regex layer's job, not the checksum's).
    """
    g = list(group_cols)
    t = F.col(token_col)
    luhn_sum = F.expr(
        f"aggregate(sequence(1, length({token_col})), 0, (acc, i) -> "
        f"acc + (CASE WHEN (length({token_col}) - i) % 2 = 0 "
        f"THEN ascii(substr({token_col}, i, 1)) - 48 "
        f"ELSE IF((ascii(substr({token_col}, i, 1)) - 48) * 2 > 9, "
        f"(ascii(substr({token_col}, i, 1)) - 48) * 2 - 9, "
        f"(ascii(substr({token_col}, i, 1)) - 48) * 2) END))"
    )
    scored = (
        df.filter(t.rlike("^[0-9]{12,19}$"))
        .withColumn("token_len", F.length(t).cast("int"))
        .withColumn("__valid", (luhn_sum % 10 == 0).cast("long"))
    )
    return (
        scored.groupBy(*g, "token_len")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("__valid").cast("long").alias("n_valid"),
        )
        .withColumn(
            "valid_ppm", F.expr("n_valid * 1000000 div n_tokens")
        )
    )


def deletion_audit(
    requests: DataFrame,
    key_col: str,
    tables: "dict[str, tuple[DataFrame, str]]",
) -> DataFrame:
    """Right-to-be-forgotten residual audit: after a deletion pass, how
    many rows STILL reference a requested subject key, per table — the
    verification step a GDPR/CCPA erasure pipeline must run before it
    can attest completion (the deletion job's own success says it ran,
    not that nothing remains — late-arriving data, missed join paths,
    and re-ingests all leave residuals).

    ``tables`` maps table name -> (DataFrame, key column). Emits one
    row per table: ``(table, n_requests, n_residual_rows,
    n_residual_keys)`` — zero residuals everywhere is the attestation.

    Shape: the request key set is deduplicated once; each audited table
    pays ONE inner equi-join keyed on its subject column plus a count
    aggregate — no table is scanned more than once, and the per-table
    plans run independently (a union of summaries, not a multi-way
    join).
    """
    keys = requests.select(F.col(key_col).alias("__k")).distinct()
    n_req = keys.count()
    outs = []
    for name, (df, col) in tables.items():
        hit = df.select(F.col(col).alias("__k")).join(keys, "__k")
        outs.append(
            hit.agg(
                F.count(F.lit(1)).cast("long").alias("n_residual_rows"),
                F.countDistinct("__k").cast("long").alias(
                    "n_residual_keys"
                ),
            ).select(
                F.lit(name).alias("table"),
                F.lit(n_req).cast("long").alias("n_requests"),
                "n_residual_rows",
                "n_residual_keys",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def expectations_report(
    df: DataFrame,
    expectations: "list[dict]",
) -> DataFrame:
    """Declarative data-quality expectations evaluated in one pass — the
    contract gate in front of a table publish (the Great-Expectations /
    dbt-test shape, relationalized): each expectation is a dict

    * ``{"name", "kind": "not_null", "col"}``
    * ``{"kind": "range", "col", "lo", "hi"}`` (inclusive)
    * ``{"kind": "in_set", "col", "values": [...]}``
    * ``{"kind": "regex", "col", "pattern"}``
    * ``{"kind": "unique", "cols": [...]}``

    and the report emits one row per expectation: ``(expectation, kind,
    n_rows, n_violations, pass)`` — ``pass = 1`` iff zero violations,
    so the publish gate is ``min(pass) = 1``.

    Shape: every ROW-level expectation compiles to a CASE-sum in a
    SINGLE aggregate over one scan (adding expectations adds
    expressions, not passes); each ``unique`` expectation pays its own
    keyed groupBy (violations = rows in excess of one per key). The
    table is never scanned more than ``1 + #unique-specs`` times.
    """
    row_specs, uniq_specs = [], []
    for e in expectations:
        (uniq_specs if e["kind"] == "unique" else row_specs).append(e)

    def _viol(e) -> Column:
        c = F.col(e["col"])
        if e["kind"] == "not_null":
            return c.isNull()
        if e["kind"] == "range":
            return c.isNull() | (c < F.lit(e["lo"])) | (c > F.lit(e["hi"]))
        if e["kind"] == "in_set":
            return c.isNull() | ~c.isin(list(e["values"]))
        if e["kind"] == "regex":
            return c.isNull() | ~c.rlike(e["pattern"])
        raise ValueError(f"unknown expectation kind {e['kind']!r}")

    def _name(e) -> str:
        return e.get("name") or f"{e['kind']}:{e.get('col') or ','.join(e['cols'])}"

    outs = []
    if row_specs:
        aggs = [F.count(F.lit(1)).cast("long").alias("__n")] + [
            F.sum(_viol(e).cast("long")).cast("long").alias(f"__v{i}")
            for i, e in enumerate(row_specs)
        ]
        wide = df.agg(*aggs)
        # label columns are built with F.lit per spec (explode of a
        # struct array), never spliced into SQL text — an expectation
        # name containing a quote (user-supplied, or regex-derived via
        # the default "kind:col" naming) must stay data, not syntax
        # (r10 ADVICE fix; same unpivot shape stack() would plan)
        spec_structs = F.array(
            *[
                F.struct(
                    F.lit(_name(e)).alias("expectation"),
                    F.lit(e["kind"]).alias("kind"),
                    F.col(f"__v{i}").alias("n_violations"),
                )
                for i, e in enumerate(row_specs)
            ]
        )
        outs.append(
            wide.select(
                F.explode(spec_structs).alias("__s"),
                F.col("__n").alias("n_rows"),
            ).select(
                F.col("__s.expectation").alias("expectation"),
                F.col("__s.kind").alias("kind"),
                "n_rows",
                F.coalesce("__s.n_violations", F.lit(0)).cast("long").alias(
                    "n_violations"
                ),
            )
        )
    for e in uniq_specs:
        keys = [F.col(c) for c in e["cols"]]
        g = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__c"))
        outs.append(
            g.agg(
                F.sum("__c").cast("long").alias("n_rows"),
                F.sum(F.expr("__c - 1")).cast("long").alias("n_violations"),
            ).select(
                F.lit(_name(e)).alias("expectation"),
                F.lit("unique").alias("kind"),
                "n_rows",
                "n_violations",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.withColumn(
        "pass", (F.col("n_violations") == 0).cast("int")
    )


def expectations_tag(
    df: DataFrame,
    expectations: "list[dict]",
    tag_col: str = "failed_expectations",
) -> DataFrame:
    """Row-level companion to :func:`expectations_report`: tag every row
    with the array of ROW-LEVEL expectation names it violates (empty
    array = clean), so a pipeline can route rows —
    ``filter(size(tag)=0)`` publishes, the rest lands in quarantine
    WITH the reason attached (the part a boolean filter loses).
    ``unique`` specs are table-level and rejected here — uniqueness is
    not a property of one row.

    Map-side only: the tag is one array expression over the same CASE
    predicates the report aggregates, so tagging adds zero shuffles to
    whatever plan follows.
    """
    for e in expectations:
        if e["kind"] == "unique":
            raise ValueError(
                "expectations_tag handles row-level kinds only; "
                "'unique' is table-level — use expectations_report"
            )

    def _viol(e) -> Column:
        c = F.col(e["col"])
        if e["kind"] == "not_null":
            return c.isNull()
        if e["kind"] == "range":
            return c.isNull() | (c < F.lit(e["lo"])) | (c > F.lit(e["hi"]))
        if e["kind"] == "in_set":
            return c.isNull() | ~c.isin(list(e["values"]))
        if e["kind"] == "regex":
            return c.isNull() | ~c.rlike(e["pattern"])
        raise ValueError(f"unknown expectation kind {e['kind']!r}")

    def _name(e) -> str:
        return e.get("name") or f"{e['kind']}:{e['col']}"

    tags = F.array_compact(
        F.array(
            *[
                F.when(_viol(e), F.lit(_name(e)))
                for e in expectations
            ]
        )
    )
    return df.withColumn(tag_col, tags)


def streaming_expectations_route(
    stream_df: DataFrame,
    expectations: "list[dict]",
    pass_path: str,
    quarantine_path: str,
    checkpoint_dir: "str | None" = None,
):
    """Streaming contract gate: tag each micro-batch with
    :func:`expectations_tag` and route rows to the publish sink or the
    quarantine sink — quarantined rows carry their
    ``failed_expectations`` array, so triage never re-derives the
    reason. The split is two filters over ONE tagged frame per trigger
    (the tag expression is map-side).

    Exactly-once output under at-least-once foreachBatch (r10 ADVICE
    fix): each sink is PARTITIONED by ``__batch_id`` and each trigger
    dynamically OVERWRITES only its own batch partition — a batch retry
    (crash between the two writes, or a restart FROM THE SAME
    checkpoint, where Structured Streaming guarantees the replayed
    batch keeps its batch id) rewrites the same partition instead of
    appending a duplicate copy. Readers see ``__batch_id`` as an extra
    partition column; dedup is structural, not best-effort.

    Sink-ownership contract (what batch-id idempotence does and does
    not cover): the guarantee holds exactly as far as Spark's batch-id
    contract — ids are stable only under a retained ``checkpoint_dir``.
    A re-run WITHOUT the checkpoint (or with ``checkpoint_dir=None``)
    is a NEW query that re-numbers batches from 0: it must write to a
    FRESH sink pair, because its batch 0 would overwrite the old run's
    partition 0 while leaving any higher-numbered partitions from the
    old run in place. For the same reason each sink directory must be
    owned by exactly one streaming query — two queries routing into one
    path clobber each other's partitions (plain ``append`` interleaved
    them, but offered no retry dedup at all).

    Row-level kinds only (``unique`` is table-level; run
    expectations_report on the published table instead — the same
    contract expectations_tag enforces).
    """

    def route(batch_df: DataFrame, batch_id: int) -> None:
        tagged = expectations_tag(batch_df, expectations).withColumn(
            "__batch_id", F.lit(batch_id).cast("long")
        )
        tagged.filter(F.size("failed_expectations") == 0).drop(
            "failed_expectations"
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("__batch_id").parquet(pass_path)
        tagged.filter(F.size("failed_expectations") > 0).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "__batch_id"
        ).parquet(quarantine_path)

    writer = stream_df.writeStream.foreachBatch(route).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
