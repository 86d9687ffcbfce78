"""Distributed embedding statistics: Gram/covariance matrix, PCA,
projection.

The 100 TB pattern for PCA over an embedding column is NOT iterative
SVD on the cluster — it is one corpus-scale pass producing d×d
sufficient statistics (Gram matrix + mean vector, ~4k doubles at
d=64), then an eigensolve on the driver in microseconds, then a
map-only projection. The corpus is scanned once and nothing
vector-sized ever shuffles: each partition emits one d×d partial, the
reduce combines #partitions of them.

Two Gram implementations:

- :func:`gram_cells_pandas` — the production path: numpy ``X.T @ X``
  per Arrow batch inside ``mapInPandas``, one (i, j)-keyed sum of the
  tiny partials. Float sums are partition-order-dependent (not
  bit-reproducible, fine for PCA).
- :func:`gram_cells_exact` — the oracle-able path: per-element products
  fixed-pointed to integer 1e-12 units and summed exactly (the repo's
  micro-unit rule for cross-row double sums, NOTES.md). Map-only
  explode + ONE cell-keyed aggregate with partial combine; d²/2 row
  amplification, so use it for audits, not the hot path. Sums are
  BIGINT — overflows around n·|x|² ≈ 9e6 corpus-units (~5e7 unit-norm
  rows at d=64); switch the cast to DECIMAL(38,0) beyond that.

Reference anchor: apache/samza has no linear-algebra surface; this is
training-data-pipeline capability (PCA-whitening embeddings before ANN
— Jégou et al.; dataset drift/covariance audits) built Spark-first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_DOUBLED = "transform({c}, x -> cast(x as double))"


def gram_cells_exact(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: float = 1e12,
) -> DataFrame:
    """Upper-triangle Gram cells ``(i, j, n, s_e12)`` with
    ``s_e12 = Σ floor((x_i · x_j) · scale)`` summed as exact integers —
    bit-identical in any engine that multiplies the same doubles."""
    v = F.expr(_DOUBLED.format(c=vec_col))
    e1 = df.select(v.alias("__v"), F.posexplode(v).alias("i", "xi"))
    e2 = e1.select(
        "i", "xi", F.posexplode(F.col("__v")).alias("j", "xj")
    ).where(F.col("j") >= F.col("i"))
    return e2.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor((F.col("xi") * F.col("xj")) * F.lit(scale)).cast("long")).alias(
            "s_e12"
        ),
    )


def gram_cells_pandas(
    df: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Production Gram path: per-Arrow-batch ``X.T @ X`` partials, one
    tiny (i, j) sum. Also emits the per-dimension sum (as ``j == -1``
    rows) so mean-centering needs no second corpus pass."""

    def partials(it):
        for pdf in it:
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if X.ndim != 2 or not len(X):
                continue
            g = X.T @ X
            d = g.shape[0]
            iu, ju = np.triu_indices(d)
            out = pd.DataFrame(
                {"i": iu, "j": ju, "n": len(X), "s": g[iu, ju]}
            )
            sums = pd.DataFrame(
                {
                    "i": np.arange(d),
                    "j": -1,
                    "n": len(X),
                    "s": X.sum(axis=0),
                }
            )
            yield pd.concat([out, sums], ignore_index=True)

    cells = df.select(vec_col).mapInPandas(
        partials, "i int, j int, n long, s double"
    )
    return cells.groupBy("i", "j").agg(
        F.sum("n").alias("n"), F.sum("s").alias("s")
    )


def pca_components(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
):
    """Top-``k`` principal components: one distributed Gram+mean pass
    (:func:`gram_cells_pandas`), driver-side eigensolve of the d×d
    covariance. Returns ``(mean: (d,), components: (k, d), evr: (k,))``
    — components row-major, explained-variance ratios descending."""
    rows = gram_cells_pandas(df, vec_col).collect()
    d = max(r["i"] for r in rows) + 1
    n = max(r["n"] for r in rows)
    gram = np.zeros((d, d))
    mean = np.zeros(d)
    for r in rows:
        if r["j"] == -1:
            mean[r["i"]] = r["s"] / n
        else:
            gram[r["i"], r["j"]] = r["s"]
            gram[r["j"], r["i"]] = r["s"]
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    evr = evals[order] / max(evals.sum(), 1e-300)
    return mean, evecs[:, order].T.copy(), evr


def project_embeddings(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Map-only projection onto the PCA basis: one vectorized pandas UDF
    over the broadcast (k, d) component matrix."""
    M = np.asarray(mean, dtype=np.float64)
    C = np.asarray(components, dtype=np.float64)

    @F.pandas_udf("array<double>")
    def proj(vs: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        if X.ndim != 2 or not len(X):
            return pd.Series([[]] * len(vs))
        Y = (X - M) @ C.T
        return pd.Series(list(Y))

    return df.withColumn(out_col, proj(F.col(vec_col)))


def centroid_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-group embedding centroid drift between two corpus snapshots
    — the embedding-space analog of the scalar distribution-drift
    monitors (tvd_drift): for each group, the squared L2 distance
    between snapshot A's and snapshot B's centroid, ALL-INTEGER so the
    number is engine- and shuffle-order-exact.

    One (group, dim)-keyed aggregate per side (map-side combinable
    fixed-point sums in DECIMAL(38,0) — the centroids_fixedpoint
    shape: shuffle volume is groups×dims cells regardless of corpus
    size), centroid cells by exact integer division, one cell join, one
    final combinable sum. Returns
    ``(group, n_a, n_b, dist2_scaled)`` with
    ``dist2_scaled = Σ_d (ca_d − cb_d)²`` in squared ``1/scale`` units
    (centroid cells are floor(Σ floor(x·scale) / n)). Groups present in
    only one snapshot are dropped (inner cell join) — their drift is
    undefined.

    Division detail: Spark's integer ``div`` truncates while DuckDB's
    ``//`` floors, so negative element sums would disagree by one unit.
    Values are therefore shifted by +2.0 BEFORE fixed-pointing (x+2.0
    is exact for float32-upcast inputs, keeping every sum nonnegative,
    where truncate == floor). Both snapshots quantize identically, so
    the shift cancels in the centroid difference up to the fixed-point
    quantization itself — the reported number is the exact drift of the
    quantized shifted space, identical in both engines.
    """

    def cells(df: DataFrame, n_alias: str) -> DataFrame:
        e = df.select(
            F.col(group_col).alias("g"),
            F.posexplode(
                F.expr(f"transform({vec_col}, x -> cast(x as double))")
            ).alias("d", "val"),
        )
        return e.groupBy("g", "d").agg(
            F.sum(
                F.expr(f"cast(floor((val + 2.0) * {scale}.0) as decimal(38,0))")
            ).alias("s"),
            F.count(F.lit(1)).alias(n_alias),
        ).select(
            "g",
            "d",
            F.expr(f"cast(s div {n_alias} as bigint)").alias("c"),
            n_alias,
        )

    ca = cells(df_a, "n_a")
    cb = cells(df_b, "n_b")
    joined = ca.alias("a").join(
        cb.alias("b"), (F.col("a.g") == F.col("b.g")) & (F.col("a.d") == F.col("b.d"))
    )
    return (
        joined.select(
            F.col("a.g").alias(group_col),
            F.col("a.n_a").alias("n_a"),
            F.col("b.n_b").alias("n_b"),
            ((F.col("a.c") - F.col("b.c")) * (F.col("a.c") - F.col("b.c"))).alias(
                "dd"
            ),
        )
        .groupBy(group_col, "n_a", "n_b")
        .agg(F.sum("dd").cast("long").alias("dist2_scaled"))
    )
