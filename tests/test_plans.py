"""Physical-plan regression tests: lock in the scale properties the
operator docstrings claim (map-only tokenization, bounded window stages,
no cartesian blowups, no row-at-a-time Python in batch paths). A change
that silently reintroduces a shuffle or a BatchEvalPython node fails
here before it costs anything at real scale."""

import pytest

from samza_spark.queries import QUERIES


def _plan(spark, name, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_bpe_tokenize_is_map_only(spark, sf_dir):
    plan = _plan(spark, "bpe_tokenize", sf_dir)
    assert "Exchange" not in plan  # single projection over the scan
    assert "BatchEvalPython" not in plan


def test_source_caps_two_phase_window_stages(spark, sf_dir):
    plan = _plan(spark, "source_caps", sf_dir)
    # exactly the two designed rank stages: (source, salt) then (source)
    assert plan.count("(2) Window") + plan.count(") Window") >= 2
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "dup_spans",
        "incremental_dedup",
        "semantic_dedup",
        "bigram_logprob",
        "nb_classifier",
        "source_stats",
        "minhash_pairs",
        "pipeline_clean",
    ],
)
def test_no_cartesian_no_rowwise_python(spark, sf_dir, name):
    plan = _plan(spark, name, sf_dir)
    assert "CartesianProduct" not in plan
    # BroadcastNestedLoopJoin is fine only for broadcast-one-row joins
    # (centroid/total attachments); row-at-a-time Python never is
    assert "BatchEvalPython" not in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, "filter", sf_dir)
    assert "PushedFilters: [" in plan
    # pruned read schema: the lineitem scan must not read all 16 columns
    assert "l_comment" not in plan


def test_indexed_dedup_plan_is_equi_join_only(spark, sf_dir):
    # the persisted-index dedup path: candidate generation must be plain
    # equi-joins against the index tables (hash/sort-merge on band,bucket
    # and on __fp) — no cartesian blowup, no row-wise Python; the only
    # Python is the Arrow-batched banding UDF over the BATCH side
    plan = _plan(spark, "indexed_dedup", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
