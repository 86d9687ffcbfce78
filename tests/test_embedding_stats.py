"""Distributed embedding statistics (pipeline/embedding_stats.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from samza_spark.pipeline import embedding_stats as es


def _vectors(n=200, d=8, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic: dominant direction along e0+e1
    base = rng.normal(size=(n, d)) * 0.1
    t = rng.normal(size=n)
    dom = np.zeros(d)
    dom[0] = dom[1] = 1 / np.sqrt(2)
    X = base + np.outer(t, dom) * 2.0 + 0.5
    return X


def _df(spark, X):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )


def test_gram_cells_exact_matches_numpy(spark):
    X = _vectors(n=50, d=4).astype(np.float32)
    df = _df(spark, X)
    cells = {(r["i"], r["j"]): (r["n"], r["s_e12"]) for r in es.gram_cells_exact(df).collect()}
    Xd = X.astype(np.float64)
    for i in range(4):
        for j in range(i, 4):
            want = int(sum(int(np.floor(a * b * 1e12)) for a, b in zip(Xd[:, i], Xd[:, j])))
            n, s = cells[(i, j)]
            assert n == 50
            assert s == want


def test_gram_cells_pandas_matches_dense(spark):
    X = _vectors(n=120, d=6)
    df = _df(spark, X.astype(np.float32)).repartition(5)
    rows = es.gram_cells_pandas(df).collect()
    Xd = X.astype(np.float32).astype(np.float64)
    G = Xd.T @ Xd
    S = Xd.sum(axis=0)
    for r in rows:
        if r["j"] == -1:
            assert r["s"] == pytest.approx(S[r["i"]], rel=1e-9)
        else:
            assert r["s"] == pytest.approx(G[r["i"], r["j"]], rel=1e-9)
        assert r["n"] == 120


def test_pca_recovers_dominant_direction(spark):
    X = _vectors(n=400, d=8)
    df = _df(spark, X.astype(np.float32))
    mean, comps, evr = es.pca_components(df, k=3)
    dom = np.zeros(8)
    dom[0] = dom[1] = 1 / np.sqrt(2)
    cos = abs(float(comps[0] @ dom))
    assert cos > 0.99
    assert evr[0] > evr[1] >= evr[2] >= 0
    assert mean == pytest.approx(X.astype(np.float32).astype(np.float64).mean(axis=0), abs=1e-6)


def test_projection_is_map_only_and_centers(spark):
    X = _vectors(n=300, d=8)
    df = _df(spark, X.astype(np.float32))
    mean, comps, _ = es.pca_components(df, k=2)
    out = es.project_embeddings(df, mean, comps)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Exchange" not in plan  # projection adds no shuffle
    Y = np.asarray([r["pca"] for r in out.orderBy("vec_id").collect()])
    assert Y.shape == (300, 2)
    # projected coordinates are mean-centered
    assert abs(Y.mean(axis=0)).max() < 1e-6
    # variance concentrates on the first component
    assert Y[:, 0].var() > Y[:, 1].var()
