"""Bloom-filter semi-join: exactness, no-false-negative prefilter,
plan shape (prefilter before the join exchange, no driver collect)."""

from pyspark.sql import functions as F

from samza_spark.catalog import load_table
from samza_spark.operators import bloomjoin


def _ids(df, col):
    return sorted(r[col] for r in df.collect())


def test_bloom_semi_join_equals_plain_semi_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    keys = (
        load_table(spark, sf_dir, "orders")
        .where("o_totalprice > 300000")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    fast = bloomjoin.bloom_semi_join(li, keys, "l_orderkey", m_bits=1 << 14)
    plain = li.join(keys.distinct(), "l_orderkey", "left_semi")
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_bloom_prefilter_has_no_false_negatives(spark):
    big = spark.range(0, 5000).select(F.col("id").alias("k"))
    small = spark.range(0, 5000, 7).select(F.col("id").alias("k"))
    # tiny, collision-heavy filter: false positives expected, never
    # false negatives
    bloom = bloomjoin.bloom_build(small, "k", m_bits=256, k=3)
    pre = set(
        _ids(bloomjoin.bloom_prefilter(big, "k", bloom, m_bits=256, k=3), "k")
    )
    members = set(_ids(small, "k"))
    assert members <= pre


def test_bloom_semi_join_exact_under_heavy_false_positives(spark):
    big = spark.range(0, 5000).select(F.col("id").alias("k"))
    small = spark.range(0, 5000, 7).select(F.col("id").alias("k"))
    out = bloomjoin.bloom_semi_join(big, small, "k", m_bits=256, k=3)
    assert _ids(out, "k") == _ids(small, "k")


def test_bloom_build_is_one_row_and_relational(spark):
    small = spark.range(0, 1000).select(F.col("id").alias("k"))
    bloom = bloomjoin.bloom_build(small, "k", m_bits=1 << 12)
    rows = bloom.collect()
    assert len(rows) == 1
    assert len(rows[0]["bloom"]) == (1 << 12) // 64
    # some bits actually set
    assert any(w != 0 for w in rows[0]["bloom"])


def test_empty_build_side_filters_everything(spark):
    big = spark.range(0, 100).select(F.col("id").alias("k"))
    empty = big.where("k < 0")
    assert bloomjoin.bloom_semi_join(big, empty, "k").count() == 0


def test_prefilter_runs_before_join_exchange(spark, sf_dir):
    """The scale property: the bloom Filter must sit on the scan side of
    the final join, not after its exchange — otherwise the shuffle
    savings don't exist."""
    li = load_table(spark, sf_dir, "lineitem")
    keys = (
        load_table(spark, sf_dir, "orders")
        .where("o_totalprice > 300000")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    plan = (
        bloomjoin.bloom_semi_join(li, keys, "l_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "forall" in plan
    # the forall filter is evaluated in a stage that scans lineitem
    # directly (same WholeStageCodegen subtree as the file scan), i.e.
    # before any exchange of the big side
    big_side = plan.split("forall")[1]
    assert "lineitem" in big_side.split("Exchange")[0]
