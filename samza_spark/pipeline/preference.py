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
