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


# -- r11 pairwise batch kernels: bit-identical to the SQL they replace --------


class TestPairwiseKernelsBitExact:
    """r10 verdict next #1: every kernelized candidate-pair expression
    must produce the SAME values (bit-for-bit for doubles, exactly for
    integers) as the interpreted expression it replaced — that is what
    keeps the DuckDB oracles hash-matching."""

    def _pair_df(self, spark, n=12, d=16):
        import numpy as np

        rng = np.random.default_rng(11)
        vecs = (
            rng.standard_normal((n, d))
            * (10.0 ** rng.integers(-6, 6, size=(n, d)))
        ).astype(np.float32)
        rows = [
            Row(i=i, a=[float(x) for x in vecs[i]],
                b=[float(x) for x in vecs[(i + 5) % n]])
            for i in range(n)
        ]
        return spark.createDataFrame(rows).select(
            "i",
            F.col("a").cast("array<float>").alias("a"),
            F.col("b").cast("array<float>").alias("b"),
        )

    def test_cosine_pairs_kernel_equals_hof_fold(self, spark):
        from samza_spark.pipeline.similarity import (
            cosine_sim_expr,
            cosine_sim_seq_pandas,
        )

        df = self._pair_df(spark)
        got = {
            r["i"]: (r["k"], r["h"])
            for r in df.select(
                "i",
                cosine_sim_seq_pandas("a", "b").alias("k"),
                cosine_sim_expr("a", "b").alias("h"),
            ).collect()
        }
        for i, (k, h) in got.items():
            assert k == h, (i, k, h, (k - h))

    def test_int_cosine_kernel_equals_sql(self, spark):
        import numpy as np

        from samza_spark.pipeline.similarity import (
            _int_cosine_sql,
            int_cosine_pairs_pandas,
        )

        rng = np.random.default_rng(3)
        rows = [
            Row(
                i=i,
                a=[int(x) for x in rng.integers(-127, 128, 24)],
                b=[int(x) for x in rng.integers(-127, 128, 24)],
            )
            for i in range(10)
        ] + [Row(i=10, a=[0] * 24, b=[1] * 24)]  # zero-norm -> 0.0
        df = spark.createDataFrame(rows)
        got = df.select(
            "i",
            int_cosine_pairs_pandas("a", "b").alias("k"),
            F.expr(_int_cosine_sql("a", "b")).alias("h"),
        ).collect()
        for r in got:
            assert r["k"] == r["h"], (r["i"], r["k"], r["h"])

    def test_jaccard_kernel_equals_set_expressions(self, spark):
        from samza_spark.pipeline.dedup import jaccard_pairs_pandas

        rows = [
            Row(i=0, a=["x", "y", "z"], b=["y", "z", "w"]),
            Row(i=1, a=["x"], b=["x"]),
            Row(i=2, a=["x", "x", "y"], b=["x"]),  # dup collapse
            Row(i=3, a=["q"], b=["r"]),
        ]
        df = spark.createDataFrame(rows)
        got = df.select(
            "i",
            jaccard_pairs_pandas("a", "b").alias("k"),
            (
                F.size(F.array_intersect("a", "b"))
                / F.size(F.array_union("a", "b"))
            ).alias("h"),
        ).collect()
        for r in got:
            assert r["k"] == r["h"], (r["i"], r["k"], r["h"])

    def test_jaccard_ppm_kernel_equals_div_expression(self, spark):
        from samza_spark.pipeline.dedup import jaccard_ppm_pandas

        rows = [
            Row(i=0, a=["x", "y", "z"], b=["y", "z", "w"]),
            Row(i=1, a=["x"], b=["y"]),
            Row(i=2, a=["a", "b", "c", "d"], b=["a", "b", "c", "d"]),
        ]
        df = spark.createDataFrame(rows)
        got = df.select(
            "i",
            jaccard_ppm_pandas("a", "b").alias("k"),
            F.expr(
                "size(array_intersect(a, b)) * 1000000 "
                "div size(array_distinct(concat(a, b)))"
            ).cast("long").alias("h"),
        ).collect()
        for r in got:
            assert r["k"] == r["h"], (r["i"], r["k"], r["h"])

    def test_sig_match_ppm_kernel_equals_zipwith_count(self, spark):
        from samza_spark.pipeline.dedup import sig_match_ppm_pandas

        rows = [
            Row(i=0, a=[1, 2, 3, 4], b=[1, 9, 3, 7]),
            Row(i=1, a=[5, 5], b=[5, 5]),
            Row(i=2, a=[1, 2], b=[3, 4]),
        ]
        df = spark.createDataFrame(rows)
        got = df.select(
            "i",
            sig_match_ppm_pandas("a", "b", 4).alias("k"),
            F.expr(
                "size(filter(zip_with(a, b, (x, y) -> x = y), v -> v)) "
                "* 1000000 div 4"
            ).cast("long").alias("h"),
        ).collect()
        for r in got:
            assert r["k"] == r["h"], (r["i"], r["k"], r["h"])

    def test_term_count_equals_hof_token_filter(self, spark):
        from samza_spark.pipeline.retrieval import _tokens, term_count

        rows = [
            Row(i=0, text="the cat sat on the   mat"),
            Row(i=1, text="cat CAT cAt"),
            Row(i=2, text="concatenate cats scatter"),  # substrings no
            Row(i=3, text=""),
            Row(i=4, text="cat"),
        ]
        df = spark.createDataFrame(rows)
        for term in ("cat", "the"):
            got = df.select(
                "i",
                term_count(F.col("text"), term).alias("k"),
                F.size(
                    F.filter(
                        _tokens(F.col("text")),
                        lambda x: x == F.lit(term),
                    )
                ).cast("long").alias("h"),
            ).collect()
            for r in got:
                assert r["k"] == r["h"], (term, r["i"], r["k"], r["h"])


# -- oov_audit: per-doc out-of-vocabulary audit (new r11 operator) -------------


class TestOovAudit:
    def test_oov_counts_occurrences_against_topk_vocab(self, spark):
        from samza_spark.pipeline.text import oov_audit

        docs = spark.createDataFrame(
            [
                (1, "a a a b"),      # a,b in vocab (top-2)
                (2, "a b c"),        # c is OOV
                (3, "x y z z"),      # z ties with b... see counts below
                (4, ""),             # empty -> 0/0/0
                (5, None),           # NULL text -> 0/0/0
            ],
            "doc_id long, text string",
        )
        # counts: a=4, z=2, b=2, x=1, y=1, c=1 -> top-2 by (count desc,
        # token asc) = a, b (b < z at the tie)
        got = {
            r["doc_id"]: (r["n_tokens"], r["oov_tokens"], r["oov_ppm"])
            for r in oov_audit(docs, k=2).collect()
        }
        assert got[1] == (4, 0, 0)
        assert got[2] == (3, 1, 333333)
        assert got[3] == (4, 4, 1000000)
        assert got[4] == (0, 0, 0)
        assert got[5] == (0, 0, 0)

    def test_plan_has_no_single_partition_window(self, spark):
        from samza_spark.advisor import (
            _count_single_partition_windows,
            explain_formatted,
        )
        from samza_spark.pipeline.text import oov_audit

        docs = spark.createDataFrame(
            [(1, "a b"), (2, "b c")], "doc_id long, text string"
        )
        plan = explain_formatted(oov_audit(docs, k=1))
        assert _count_single_partition_windows(plan) == 0
        assert "CartesianProduct" not in plan


class TestConnectedComponentsInlineConvergence:
    """The r11 optimization folds the per-round convergence check into
    the checkpointed round output (a ``__chg`` flag) instead of a
    labels-vs-new-labels shuffle join; values and the output contract
    must be untouched."""

    def test_output_schema_has_no_flag_column(self, spark):
        from samza_spark.pipeline.dedup import connected_components

        pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
        out = connected_components(pairs)
        assert out.columns == ["doc_id", "component"]

    def test_early_convergence_on_star_graph(self, spark):
        # a star around node 0 converges in one round; the inline flag
        # must report "no change" on round 2 and stop with min labels
        from samza_spark.pipeline.dedup import connected_components

        pairs = spark.createDataFrame(
            [(0, i) for i in range(1, 6)], "a long, b long"
        )
        comp = {
            r.doc_id: r.component
            for r in connected_components(pairs, max_iter=20).collect()
        }
        assert comp == {i: 0 for i in range(6)}

    def test_two_components_chain_and_pair(self, spark):
        from samza_spark.pipeline.dedup import connected_components

        pairs = spark.createDataFrame(
            [(10, 11), (11, 12), (12, 13), (50, 51)], "a long, b long"
        )
        comp = {
            r.doc_id: r.component
            for r in connected_components(pairs).collect()
        }
        assert comp == {10: 10, 11: 10, 12: 10, 13: 10, 50: 50, 51: 50}


class TestKernelSingleEvaluation:
    """The pair kernels are marked non-deterministic so the optimizer
    cannot clone them below threshold filters (guide-class duplicated
    ArrowEvalPython: filter copy + projection copy = every candidate
    pair scored twice). Pin: exactly ONE ArrowEvalPython per kernel in
    the verify plans, and values unchanged."""

    def _plan(self, df) -> str:
        from samza_spark.advisor import explain_formatted

        return explain_formatted(df)

    @staticmethod
    def _n_nodes(plan: str, op: str) -> int:
        # formatted explain prints every node twice (tree line + the
        # numbered "(N) Op" detail header) — count the detail headers
        import re

        return len(re.findall(rf"^\(\d+\) {op}", plan, re.M))

    def test_jaccard_verify_single_kernel_node(self, spark):
        from samza_spark.pipeline import dedup

        docs = spark.createDataFrame(
            [(i, f"tok{i} alpha beta gamma delta common words here")
             for i in range(8)],
            "doc_id long, text string",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (3, 4)], "a long, b long"
        )
        # impl pinned to the kernel path: the single-evaluation property
        # is a property of the ND-marked kernel, independent of which
        # impl a given call site defaults to (r12 A/B decides defaults)
        plan = self._plan(
            dedup.jaccard_verify(docs, pairs, threshold=0.5, impl="kernel")
        )
        assert self._n_nodes(plan, "ArrowEvalPython") == 1, plan

    def test_similarity_join_single_kernel_node(self, spark):
        from samza_spark.pipeline import linkage

        docs = spark.createDataFrame(
            [(i, "the quick brown fox jumps over the lazy dog " + "x" * (i % 3))
             for i in range(6)],
            "doc_id long, text string",
        )
        out = linkage.similarity_join(docs, threshold=0.5, impl="kernel")
        plan = self._plan(out)
        # the operator persists its output, and explain of a cached frame
        # prints the cached plan more than once — so count STACKED kernel
        # nodes (two adjacent ArrowEvalPython tree lines, the signature of
        # the filter-clone duplication) rather than total occurrences
        lines = [
            ln.strip().lstrip("+-:* ").split(" ")[0]
            for ln in plan.splitlines()
            if "ArrowEvalPython" in ln or "Filter" in ln
        ]
        for prev, cur in zip(lines, lines[1:]):
            assert not (
                prev == "ArrowEvalPython" and cur == "ArrowEvalPython"
            ), plan

    def test_jaccard_verify_values_unchanged_by_nd_marking(self, spark):
        from samza_spark.pipeline import dedup

        docs = spark.createDataFrame(
            [
                (1, "a b c d e"),
                (2, "a b c d f"),
                (3, "x y z w v"),
                (4, "x y z w q"),
            ],
            "doc_id long, text string",
        )
        pairs = spark.createDataFrame([(1, 2), (3, 4)], "a long, b long")
        got = {
            (r.a, r.b): r.jaccard
            for r in dedup.jaccard_verify(docs, pairs, threshold=0.0).collect()
        }
        # reference: the SQL set expressions the kernel replaced, over the
        # same char-5-gram shingle arrays
        from samza_spark.pipeline.dedup import _shingle_expr

        sh = docs.select(
            "doc_id", _shingle_expr("text", "char", 5).alias("sh")
        )
        ref = {
            (r.a, r.b): r.j
            for r in pairs.join(
                sh.withColumnsRenamed({"doc_id": "a", "sh": "sh_a"}), "a"
            )
            .join(sh.withColumnsRenamed({"doc_id": "b", "sh": "sh_b"}), "b")
            .selectExpr(
                "a",
                "b",
                "size(array_intersect(sh_a, sh_b)) / "
                "size(array_union(sh_a, sh_b)) AS j",
            )
            .collect()
        }
        assert got == ref and len(got) == 2
