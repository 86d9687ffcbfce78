"""Round-11 fixes.

Covers the r10 ADVICE.md findings (exact-cosine kernel dimension
validation, the knn self-audit cap contract, the opt-in left-id
uniqueness assertion in banded_range_join) plus the r10 verdict asks
(broadcast query matrix in the exact kernel).
"""

import pytest
from pyspark.sql import Row, functions as F


# -- exact-cosine kernel: vector-dimension validation (r10 ADVICE medium) ------


class TestCosineKernelDimValidation:
    def _corpus(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id int, embedding array<double>"
        )

    def test_short_corpus_vector_is_dropped_not_truncated(self, spark):
        # old zip_with fold: pad-with-NULL -> NULL cosine -> never ranks.
        # The kernel must drop the row, not silently truncate the dot
        # product (C=[1,2] vs Q=[1,1,5] used to score 3.0 and rank).
        from samza_spark.pipeline.similarity import cosine_topk

        corpus = self._corpus(
            spark,
            [(1, [1.0, 2.0]), (2, [1.0, 1.0, 5.0]), (3, [0.0, 1.0, 4.0])],
        )
        queries = self._corpus(spark, [(2, [1.0, 1.0, 5.0])])
        got = cosine_topk(corpus, queries, k=5).collect()
        assert [r["neighbor_id"] for r in got] == [3]

    def test_long_corpus_vector_is_dropped_not_crashed(self, spark):
        from samza_spark.pipeline.similarity import cosine_topk

        corpus = self._corpus(
            spark,
            [(1, [1.0, 2.0, 3.0, 4.0]), (3, [0.0, 1.0, 4.0])],
        )
        queries = self._corpus(spark, [(2, [1.0, 1.0, 5.0])])
        got = cosine_topk(corpus, queries, k=5).collect()
        assert [r["neighbor_id"] for r in got] == [3]

    def test_ragged_batch_does_not_crash_shape_unpack(self, spark):
        # several mismatched lengths in ONE arrow batch used to make
        # np.asarray build an object array and crash on C.shape unpack
        from samza_spark.pipeline.similarity import cosine_topk

        corpus = self._corpus(
            spark,
            [
                (1, [1.0]),
                (2, [1.0, 2.0]),
                (3, [0.0, 1.0, 4.0]),
                (4, [2.0, 2.0, 10.0]),
                (5, [1.0, 2.0, 3.0, 4.0]),
            ],
        ).coalesce(1)
        queries = self._corpus(spark, [(9, [1.0, 1.0, 5.0])])
        got = cosine_topk(corpus, queries, k=5).collect()
        assert [r["neighbor_id"] for r in got] == [4, 3]

    def test_mixed_dim_query_set_raises(self, spark):
        from samza_spark.pipeline.similarity import cosine_topk

        corpus = self._corpus(spark, [(1, [1.0, 2.0, 3.0])])
        queries = self._corpus(
            spark, [(2, [1.0, 2.0]), (3, [1.0, 2.0, 3.0])]
        )
        with pytest.raises(ValueError, match="mixed dimensions"):
            cosine_topk(corpus, queries, k=5)

    def test_all_corpus_rows_mismatched_yields_empty(self, spark):
        from samza_spark.pipeline.similarity import cosine_topk

        corpus = self._corpus(spark, [(1, [1.0, 2.0])])
        queries = self._corpus(spark, [(2, [1.0, 1.0, 5.0])])
        assert cosine_topk(corpus, queries, k=5).count() == 0


# -- banded_range_join: opt-in left-id uniqueness assertion (r10 ADVICE) -------


class TestOuterBandUniqueIdAssertion:
    def _frames(self, spark, left_rows):
        left = spark.createDataFrame(
            left_rows, "click_id int, lts string"
        ).select("click_id", F.col("lts").cast("timestamp").alias("lts"))
        right = spark.createDataFrame(
            [Row(pid=100, rts="2024-01-01 00:02:00")]
        ).select("pid", F.col("rts").cast("timestamp").alias("rts"))
        return left, right

    def test_duplicate_ids_raise_when_asserted(self, spark):
        from samza_spark.operators.rangejoin import banded_range_join

        left, right = self._frames(
            spark,
            [(7, "2024-01-01 00:00:00"), (7, "2024-06-01 00:00:00")],
        )
        with pytest.raises(ValueError, match="uniquely identify"):
            banded_range_join(
                left, right, "lts", "rts",
                how="left", left_id_cols=["click_id"],
                assert_unique_ids=True,
            )

    def test_duplicate_null_ids_raise_when_asserted(self, spark):
        # the exact silent-loss case from r10 ADVICE: two distinct left
        # rows both carrying NULL conflate under the null-safe anti-join
        from samza_spark.operators.rangejoin import banded_range_join

        left, right = self._frames(
            spark,
            [(None, "2024-01-01 00:00:00"), (None, "2024-06-01 00:00:00")],
        )
        with pytest.raises(ValueError, match="uniquely identify"):
            banded_range_join(
                left, right, "lts", "rts",
                how="left", left_id_cols=["click_id"],
                assert_unique_ids=True,
            )

    def test_unique_ids_pass_the_assertion(self, spark):
        from samza_spark.operators.rangejoin import banded_range_join

        left, right = self._frames(
            spark,
            [(7, "2024-01-01 00:00:00"), (8, "2024-06-01 00:00:00")],
        )
        out = banded_range_join(
            left, right, "lts", "rts",
            how="left", left_id_cols=["click_id"],
            assert_unique_ids=True,
        )
        assert out.count() == 2


# -- exact kernel ships the query matrix as a broadcast (r10 verdict #5) -------


def test_exact_kernel_broadcasts_query_matrix(spark):
    # the query matrix must ride a one-per-executor broadcast, not the
    # per-task closure: at the 100k x 64-dim cap the closure form
    # re-serializes ~51 MB into every task
    import samza_spark.pipeline.similarity as sim

    calls = []
    orig = spark.sparkContext.broadcast

    def spy(value):
        calls.append(value)
        return orig(value)

    spark.sparkContext.broadcast = spy
    try:
        corpus = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
            "vec_id int, embedding array<double>",
        )
        queries = spark.createDataFrame(
            [(9, [1.0, 0.5])], "vec_id int, embedding array<double>"
        )
        got = sim.cosine_topk(corpus, queries, k=2).collect()
        assert len(got) == 2
    finally:
        spark.sparkContext.broadcast = orig
    assert any(
        isinstance(v, tuple) and len(v) == 4 for v in calls
    ), "query matrix was not broadcast"
