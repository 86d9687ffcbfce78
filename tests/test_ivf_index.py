"""Persisted IVF index lifecycle (pipeline.similarity): build/probe
equivalence with the ephemeral path, incremental append, and the
partition-pruned probe scan."""

from pyspark.sql import functions as F

from samza_spark.pipeline.similarity import (
    build_ivf_index,
    ivf_index_append,
    ivf_index_probe,
    ivf_topk,
    load_ivf_centroids,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def test_probe_matches_ephemeral_ivf(spark, tmp_path):
    """Training is deterministic (seeded sample + rng), so the persisted
    index must answer EXACTLY like ivf_topk built on the same corpus."""
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_lists=8)
    got = ivf_index_probe(spark, idx, queries, k=5, n_probe=3)
    want = ivf_topk(emb, queries, k=5, n_lists=8, n_probe=3)
    as_set = lambda df: {  # noqa: E731
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in df.collect()
    }
    assert as_set(got) == as_set(want)


def test_append_serves_new_vectors_without_rebuild(spark, tmp_path):
    emb = _emb(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_lists=8)
    # append a clone of vector 7 under a fresh id: it must show up as
    # its own top neighbor (cosine 1) on the next probe
    clone = emb.filter(F.col("vec_id") == 7).select(
        F.lit(999_999).alias("vec_id"), "embedding"
    )
    ivf_index_append(spark, idx, clone)
    res = ivf_index_probe(
        spark, idx, emb.filter(F.col("vec_id") == 7), k=3, n_probe=2
    ).collect()
    assert res[0]["neighbor_id"] == 999_999
    assert res[0]["cosine"] > 0.999999


def test_probe_scan_is_partition_pruned(spark, tmp_path):
    emb = _emb(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_lists=8)
    probed = ivf_index_probe(
        spark, idx, emb.filter(F.col("vec_id") == 3), k=5, n_probe=2
    )
    plan = probed._sc._jvm.PythonSQLUtils.explainString(
        probed._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [list_id" in plan.replace("  ", " ") or (
        "PartitionFilters" in plan and "list_id" in plan
    )


def test_centroids_roundtrip_unit_norm(spark, tmp_path):
    import numpy as np

    emb = _emb(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_lists=8)
    C = load_ivf_centroids(spark, idx)
    assert C.shape[0] == 8
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0, atol=1e-9)
