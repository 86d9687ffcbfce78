"""Similarity search over embedding columns (array<float>).

Two paths:

* ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set against the corpus, dot products via ``zip_with`` + ``aggregate``
  (JVM-side, sequential fold so a DuckDB oracle reproduces the float math
  bit-for-bit), rank with a window. One corpus scan, no corpus shuffle —
  at 100 TB this is the right exact baseline (queries are broadcast; the
  big side never moves).
* ``hyperplane_buckets`` / ``ann_topk`` — LSH-bucketed approximate path:
  sign-of-projection onto deterministic pseudo-random hyperplanes built
  from xxhash64 (no RNG state, reproducible across runs/executors), then
  top-k within matching buckets only. Recall is tunable via n_planes /
  multi-probe; the candidate join is an equi-join on bucket id, so shuffle
  volume is O(n), not O(n·q).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _as_double(col: str) -> str:
    return f"transform({col}, x -> cast(x as double))"


def dot_expr(a: str, b: str) -> Column:
    """Sequential-fold dot product: sum_i a[i]*b[i] in list order, double
    accumulation from 0.0 — byte-identical to DuckDB list_reduce oracle."""
    return F.expr(
        f"aggregate(zip_with({_as_double(a)}, {_as_double(b)}, (x, y) -> x * y), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def norm_expr(a: str) -> Column:
    return F.expr(
        f"sqrt(aggregate(transform({_as_double(a)}, x -> x * x), "
        f"cast(0.0 as double), (acc, v) -> acc + v))"
    )


def cosine_sim_expr(a: str, b: str) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine, rank), ties broken by
    neighbor_id so results are total-ordered and oracle-comparable.
    """
    query_id_col = query_id_col or id_col
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_sim_expr("__cv", "__qv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_buckets(
    df: DataFrame, vec_col: str = "embedding", n_planes: int = 8
) -> DataFrame:
    """Assign each vector an LSH bucket: bit j = sign(<v, h_j>) where
    hyperplane h_j has components in {-1,+1} derived from
    xxhash64(j, dim_index) — deterministic, no stored model."""
    dim_component = (
        "(case when (xxhash64(concat('pl', cast({j} as string), ':', cast(i as string))) & 1) = 1 "
        "then 1.0 else -1.0 end)"
    )
    bit_terms = " + ".join(
        f"(case when aggregate(zip_with({_as_double(vec_col)}, "
        f"transform(sequence(0, size({vec_col}) - 1), i -> {dim_component.format(j=j)}), "
        f"(x, h) -> x * h), cast(0.0 as double), (acc, v) -> acc + v) >= 0.0 "
        f"then shiftleft(1L, {j}) else 0L end)"
        for j in range(n_planes)
    )
    return df.withColumn("bucket", F.expr(f"({bit_terms})"))


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    At 1000-executor scale the corpus is hash-partitioned by bucket once
    (one shuffle), queries broadcast, and each executor scans only its
    bucket's slice — the IVF-style scale path."""
    c = hyperplane_buckets(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "__cv",
        n_planes,
    )
    q = F.broadcast(
        hyperplane_buckets(
            queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
            "__qv",
            n_planes,
        ).withColumnRenamed("bucket", "qbucket")
    )
    scored = (
        c.join(q, F.col("bucket") == F.col("qbucket"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_sim_expr("__cv", "__qv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
