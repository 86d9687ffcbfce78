"""Preference-pair mining, curriculum ordering, and multi-signal rank
fusion for training-data curation.

Reference parity: these are corpus-curation shapes a Samza user would run
as multi-stage StreamApplication jobs (map -> partitionBy -> window
aggregate, samza-api/.../operators/MessageStream.java); here each is ONE
declarative DataFrame plan so Catalyst keeps the aggregates map-side
partial and the only shuffles are the stated group-by keys.

Scale posture:

* :func:`preference_pairs` — one groupBy(group_cols) with ``max_by`` /
  ``min_by`` (map-side combinable): the shuffle carries one row per group,
  never the corpus.
* :func:`curriculum_order` — stage assignment is a map-only integer
  expression over precomputed group counts (one tiny broadcast), the
  intra-stage order key is a content hash: no global sort anywhere.
* :func:`signal_fusion` — three bounded rank windows over integer keys;
  fusion weights are exact integers (floor(1e12 / (k + rank))) so the
  fused ordering is deterministic and cross-engine bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from samza_spark.pipeline.text import quality_micro, token_count


def preference_pairs(
    df: DataFrame,
    group_cols: "list[str] | tuple[str, ...]" = ("source", "lang"),
    id_col: str = "doc_id",
    quality: Column | None = None,
    min_margin_micro: int = 0,
) -> DataFrame:
    """Best-vs-worst preference pairs per group — the RLHF / DPO pair-
    mining shape: within each (prompt-)group, the highest-quality document
    becomes ``chosen`` and the lowest-quality ``rejected``.

    Quality defaults to :func:`~samza_spark.pipeline.text.quality_micro`
    (exact integer micro-units); ties break on ascending id, so the pair
    selection is fully deterministic. Groups with fewer than two documents
    or ``margin <= min_margin_micro`` are dropped (a pair needs a real
    preference signal).

    ONE aggregation: ``max_by(id, (q, -id))`` / ``min_by(id, (q, id))``
    pick both endpoints map-side — the shuffle is group-cardinality-sized,
    so the plan survives a 100 TB corpus as long as groups do.
    """
    q = quality if quality is not None else quality_micro("text")
    d = df.select(*group_cols, F.col(id_col).alias("__id"), q.alias("__q"))
    agg = d.groupBy(*group_cols).agg(
        F.expr("max_by(__id, struct(__q, -__id))").alias("chosen_id"),
        F.expr("min_by(__id, struct(__q, __id))").alias("rejected_id"),
        F.max("__q").alias("chosen_q_micro"),
        F.min("__q").alias("rejected_q_micro"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return (
        agg.withColumn(
            "margin_micro", F.col("chosen_q_micro") - F.col("rejected_q_micro")
        )
        .filter(
            (F.col("n_docs") >= 2) & (F.col("margin_micro") > min_margin_micro)
        )
        .select(
            *group_cols,
            "chosen_id",
            "rejected_id",
            "chosen_q_micro",
            "rejected_q_micro",
            "margin_micro",
            "n_docs",
        )
    )


def curriculum_order(
    df: DataFrame,
    n_stages: int = 4,
    id_col: str = "doc_id",
    quality: Column | None = None,
    salt: str = "curriculum0",
) -> DataFrame:
    """Curriculum-learning order: assign each document a difficulty
    ``stage`` (1 = easiest/highest quality, ``n_stages`` = hardest) by
    exact global quality quantile, plus a deterministic ``order_key`` that
    shuffles WITHIN each stage (md5 content hash) — the training loader
    sorts by (stage, order_key) and gets easy->hard progression with
    decorrelated batches inside a stage.

    Exactness: stage = ``((rank - 1) * n_stages) div n`` + 1 over the
    range-exchange global rank (operators.rank — no single-partition
    sort); the intra-stage key is the first 13 md5 hex digits as a BIGINT,
    so the full ordering is reproducible bit-for-bit on any cluster
    layout.
    """
    from samza_spark.operators.rank import global_rank

    q = quality if quality is not None else quality_micro("text")
    d = df.withColumn("__q", q)
    ranked = global_rank(
        d,
        order_by=[F.col("__q").desc(), F.col(id_col).asc()],
        rank_col="global_rank",
    )
    n = d.count()
    order_key = F.expr(
        f"cast(conv(substr(md5(concat('{salt}', '|', cast({id_col} as string))), "
        "1, 13), 16, 10) as bigint)"
    )
    return (
        ranked.withColumn(
            "stage",
            (((F.col("global_rank") - 1) * n_stages) / F.lit(n)).cast("long")
            + 1,
        )
        .withColumn("order_key", order_key)
        .select(
            id_col,
            F.col("__q").alias("quality_micro"),
            "global_rank",
            "stage",
            "order_key",
        )
    )


def signal_fusion(
    df: DataFrame,
    k: int = 60,
    top: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank-fusion of three independent quality signals —
    heuristic quality, length, and token count — into one robust curation
    ranking (the RRF trick from hybrid retrieval applied to data quality:
    rank fusion is scale-free, so wildly different signal ranges combine
    without normalization).

    Exact integer arithmetic: each signal contributes
    ``floor(1e12 / (k + rank))`` (BIGINT — both engines integer-divide),
    summed; final order (fused DESC, id ASC) is deterministic. Each rank
    is a range-exchange :func:`~samza_spark.operators.rank.global_rank`
    (NO single-partition window anywhere), and the top slice is a
    TakeOrderedAndProject.
    """
    from samza_spark.operators.rank import global_rank

    d = df.select(
        F.col(id_col),
        quality_micro("text").alias("__q"),
        F.col("n_chars").cast("long").alias("__len"),
        token_count(F.col("text")).alias("__tok"),
    )
    rank_names = {
        "__q": "quality_rank",
        "__len": "length_rank",
        "__tok": "token_rank",
    }
    fused = F.lit(0).cast("long")
    for sig, rname in rank_names.items():
        d = global_rank(
            d, order_by=[F.col(sig).desc(), F.col(id_col).asc()], rank_col=rname
        )
        fused = fused + F.expr(f"1000000000000L div ({k} + {rname})")
    return (
        d.withColumn("fused_score", fused)
        .select(
            id_col,
            F.col("quality_rank").cast("int").alias("quality_rank"),
            F.col("length_rank").cast("int").alias("length_rank"),
            F.col("token_rank").cast("int").alias("token_rank"),
            "fused_score",
        )
        .orderBy(F.col("fused_score").desc(), F.col(id_col).asc())
        .limit(top)
    )


def pairwise_matches(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    top_m: int = 8,
) -> DataFrame:
    """Round-robin pairwise "matches" between the ``top_m``
    highest-quality documents of each group — the input shape for
    Bradley–Terry / Elo rating (Chatbot-Arena-style pairwise preference
    data, derived here deterministically from the integer quality score).

    The winner of a pair is the higher :func:`quality_micro` (ties break
    to the lower id). Per-group work is bounded by ``top_m`` (the rank
    window is PARTITIONED by group; the pair expansion is
    ``top_m*(top_m-1)/2`` rows per group, never corpus-squared).

    Returns ``(group, id_a, id_b, winner)`` with ``id_a < id_b`` by
    quality rank.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col("__q").desc(), F.col(id_col).asc()
    )
    top = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(id_col).alias("id"),
            quality_micro("text").alias("__q"),
        )
        .withColumn("r", F.row_number().over(Window.partitionBy("grp").orderBy(
            F.col("__q").desc(), F.col("id").asc())))
        .filter(F.col("r") <= top_m)
    )
    a = top.select("grp", F.col("id").alias("id_a"), F.col("__q").alias("q_a"),
                   F.col("r").alias("r_a"))
    b = top.select("grp", F.col("id").alias("id_b"), F.col("__q").alias("q_b"),
                   F.col("r").alias("r_b"))
    return (
        a.join(b, "grp")
        .filter(F.col("r_a") < F.col("r_b"))
        .select(
            "grp",
            "id_a",
            "id_b",
            F.when(
                (F.col("q_a") > F.col("q_b"))
                | ((F.col("q_a") == F.col("q_b")) & (F.col("id_a") < F.col("id_b"))),
                F.col("id_a"),
            ).otherwise(F.col("id_b")).alias("winner"),
        )
    )


def elo_ratings(
    matches: DataFrame,
    iterations: int = 3,
    scale_micro: int = 1_000_000,
) -> DataFrame:
    """Bradley–Terry skill ratings from pairwise match outcomes via the
    classic minorization-maximization update (Hunter 2004, public), in
    EXACT integer fixed-point so both engines agree bit-for-bit:

        denom_i = sum_j floor(1e12 / (r_i + r_j))   (one term per match)
        r_i'    = floor(W_i * 1e12 / denom_i)       (W_i = wins of i)
        then per-group renormalize so sum(r) == n_players * 1e6.

    ``iterations`` is a FIXED count (the oracle unrolls the same chain).
    Scale posture: the ratings table is |groups| x top_m rows (bounded by
    :func:`pairwise_matches`); each iteration is two small self-joins on
    that bounded table — the corpus is touched only once upstream, in the
    match-mining aggregate. Undefeated/never-winning players get the
    natural MM endpoints (renormalized max / exact 0).

    Reference parity: rating/ranking jobs are a canonical Samza stateful
    aggregation example (store + per-key update task,
    samza-api/src/main/java/org/apache/samza/task/StreamTask.java); here
    the whole fixed-point loop is a deterministic batch DAG.

    Returns ``(grp, id, rating_micro, wins, n_matches, rank)``.
    """
    m = matches.select("grp", "id_a", "id_b", "winner")
    # Per-player static tallies: wins and match count.
    sides = m.select("grp", F.col("id_a").alias("id"), "winner").unionByName(
        m.select("grp", F.col("id_b").alias("id"), "winner")
    )
    tallies = sides.groupBy("grp", "id").agg(
        F.sum(F.when(F.col("winner") == F.col("id"), 1).otherwise(0))
        .cast("long")
        .alias("wins"),
        F.count(F.lit(1)).cast("long").alias("n_matches"),
    )
    ratings = tallies.select(
        "grp", "id", "wins", "n_matches",
        F.lit(scale_micro).cast("long").alias("rating_micro"),
    ).localCheckpoint(eager=True)

    for _ in range(iterations):
        r_a = ratings.select(F.col("grp").alias("grp"), F.col("id").alias("id_a"),
                             F.col("rating_micro").alias("ra"))
        r_b = ratings.select(F.col("grp").alias("grp"), F.col("id").alias("id_b"),
                             F.col("rating_micro").alias("rb"))
        pairs = m.join(r_a, ["grp", "id_a"]).join(r_b, ["grp", "id_b"])
        contrib = pairs.select(
            "grp", F.col("id_a").alias("id"),
            F.expr("1000000000000L div greatest(ra + rb, 1L)").alias("c"),
        ).unionByName(
            pairs.select(
                "grp", F.col("id_b").alias("id"),
                F.expr("1000000000000L div greatest(ra + rb, 1L)").alias("c"),
            )
        )
        denom = contrib.groupBy("grp", "id").agg(
            F.sum("c").cast("long").alias("denom")
        )
        upd = (
            ratings.drop("rating_micro")
            .join(denom, ["grp", "id"])
            .withColumn(
                "raw", F.expr("(wins * 1000000000000L) div denom").cast("long")
            )
        )
        # Exact renormalize: sum(r) == n_players * scale per group.
        tot = upd.groupBy("grp").agg(
            F.sum("raw").cast("long").alias("tot"),
            F.count(F.lit(1)).cast("long").alias("np"),
        )
        ratings = (
            upd.join(tot, "grp")
            .withColumn(
                "rating_micro",
                F.expr(f"(raw * np * {scale_micro}L) div greatest(tot, 1L)").cast(
                    "long"
                ),
            )
            .select("grp", "id", "wins", "n_matches", "rating_micro")
            .localCheckpoint(eager=True)
        )

    w = Window.partitionBy("grp").orderBy(
        F.col("rating_micro").desc(), F.col("id").asc()
    )
    return ratings.select(
        "grp", "id", "rating_micro", "wins", "n_matches",
        F.row_number().over(w).cast("int").alias("rank"),
    )


def borda_count(
    df: DataFrame,
    voter_col: str,
    candidate_col: str,
    score_col: str,
) -> DataFrame:
    """Borda-count rank aggregation — the positional voting rule that
    turns many noisy per-voter rankings into one consensus ranking
    (robust preference aggregation for labeler/ranker ensembles; unlike
    majority vote it uses the WHOLE ranking, so partial agreement still
    counts). Each voter ranks candidates by ``score_col`` descending
    (ties break on candidate id ascending — fully deterministic);
    a candidate at rank r among K candidates earns K - r points.

    Emits per-candidate ``(candidate, n_votes, borda_points,
    mean_rank_micro)``. Shape: one rank window partitioned by voter +
    one candidate-keyed aggregate — both shuffles are bounded by the
    vote table, and the K scalar rides along as a broadcast.
    """
    from pyspark.sql import Window

    k = df.select(candidate_col).distinct().agg(
        F.count(F.lit(1)).alias("k")
    )
    w = Window.partitionBy(voter_col).orderBy(
        F.col(score_col).desc(), F.col(candidate_col).asc()
    )
    ranked = df.withColumn("__rank", F.row_number().over(w)).crossJoin(
        F.broadcast(k)
    )
    return (
        ranked.groupBy(F.col(candidate_col).alias("candidate"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_votes"),
            F.sum(F.expr("k - __rank")).cast("long").alias("borda_points"),
            F.expr(
                "cast(sum(__rank) * 1000000 div count(1) as bigint)"
            ).alias("mean_rank_micro"),
        )
    )


def length_bias_audit(
    pairs: DataFrame,
    chosen_len_col: str = "chosen_len",
    rejected_len_col: str = "rejected_len",
    bucket_width: int = 10,
    n_buckets: int = 10,
) -> DataFrame:
    """Length-bias audit for preference pairs — the standard RLHF
    pathology check: if ``chosen`` wins mostly by being LONGER, a reward
    model trained on these pairs learns verbosity, not quality. Buckets
    pairs by |len gap| (capped at ``n_buckets - 1``) and reports how
    often the chosen side is the longer one, as exact ppm.

    Emits ``(gap_bucket, n_pairs, chosen_longer, rejected_longer, ties,
    longer_win_ppm)`` where ``longer_win_ppm`` is chosen-longer wins
    over non-tie pairs (0 when every pair ties). One aggregate over the
    (already group-sized) pair table."""
    g = F.col(chosen_len_col) - F.col(rejected_len_col)
    bw, nb = int(bucket_width), int(n_buckets)
    tagged = pairs.select(
        F.least(
            F.expr(f"abs({chosen_len_col} - {rejected_len_col}) div {bw}"),
            F.lit(nb - 1),
        ).cast("int").alias("gap_bucket"),
        F.when(g > 0, 1).otherwise(0).alias("__cl"),
        F.when(g < 0, 1).otherwise(0).alias("__rl"),
        F.when(g == 0, 1).otherwise(0).alias("__tie"),
    )
    return (
        tagged.groupBy("gap_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("__cl").cast("long").alias("chosen_longer"),
            F.sum("__rl").cast("long").alias("rejected_longer"),
            F.sum("__tie").cast("long").alias("ties"),
        )
        .withColumn(
            "longer_win_ppm",
            F.expr(
                "case when n_pairs - ties > 0 then "
                "chosen_longer * 1000000 div (n_pairs - ties) else 0 end"
            ),
        )
    )
