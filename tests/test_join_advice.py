"""Sketch-driven join-order advice (advisor.sketch_join_advice):
one-sided estimates, threshold strategy, build side, greedy rank."""

from pyspark.sql import functions as F

from samza_spark.advisor import sketch_join_advice


def test_advice_invariants(spark):
    # a: 1000 rows over 100 keys; b: 100 rows, 1 per key -> join = 1000
    # c: 10 rows joining b on a second key -> tiny edge, ranked first
    a = spark.range(1000).select((F.col("id") % 100).alias("ka"))
    b = spark.range(100).select(F.col("id").alias("kb"), (F.col("id") % 10).alias("kc"))
    c = spark.range(10).select(F.col("id").alias("kc"))
    rows = {
        r["edge"]: r
        for r in sketch_join_advice(
            [
                ("a", a, "ka", "b", b, "kb"),
                ("b", b, "kc", "c", c, "kc"),
            ],
            broadcast_threshold_rows=500,
        ).collect()
    }
    ab, bc = rows["a|b"], rows["b|c"]

    # exact input counts
    assert (ab["left_rows"], ab["right_rows"]) == (1000, 100)
    # count-min inner product never underestimates the true join size
    assert ab["est_join_size"] >= 1000
    assert bc["est_join_size"] >= 100  # b joins c: 100 rows match
    # strategy: b (100) and c (10) fit the 500-row threshold
    assert ab["strategy"] == "broadcast" and ab["build_side"] == "b"
    assert bc["strategy"] == "broadcast" and bc["build_side"] == "c"
    # greedy rank: the smaller estimated edge first
    assert bc["join_rank"] < ab["join_rank"]


def test_shuffle_strategy_above_threshold(spark):
    a = spark.range(2000).select((F.col("id") % 50).alias("k"))
    b = spark.range(3000).select((F.col("id") % 50).alias("k"))
    [r] = sketch_join_advice(
        [("a", a, "k", "b", b, "k")], broadcast_threshold_rows=100
    ).collect()
    assert r["strategy"] == "shuffle"
    assert r["build_side"] == "a"  # smaller side
    assert r["est_join_size"] >= 2000 * 3000 // 50  # true size 120k
