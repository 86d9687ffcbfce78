"""Round-10 fixes and conformance surfaces.

Covers the r9 ADVICE.md findings (null-safe outer-band anti-join,
PPJoin cap census, expectations-report label injection, idempotent
streaming routing, advisor tree-walk) plus the r10 verdict asks
(check_correctness unknown-name error, driver-window oracle pairing,
interval parsing without a Spark job).
"""

import subprocess
import sys
from pathlib import Path

import pytest
from pyspark.sql import Row, functions as F

REPO_ROOT = Path(__file__).resolve().parents[1]


# -- banded_range_join: null-safe anti-join complement ------------------------


class TestOuterBandNullIds:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [
                Row(click_id=None, lts="2024-01-01 00:00:00"),
                Row(click_id=7, lts="2024-01-01 00:00:00"),
                Row(click_id=8, lts="2024-06-01 00:00:00"),  # no match
            ]
        ).select("click_id", F.col("lts").cast("timestamp").alias("lts"))
        right = spark.createDataFrame(
            [Row(pid=100, rts="2024-01-01 00:02:00")]
        ).select("pid", F.col("rts").cast("timestamp").alias("rts"))
        return left, right

    def test_matched_null_id_row_is_not_duplicated(self, spark):
        # r10 ADVICE fix: a left row with NULL in an id column that DID
        # match must not re-appear in the unmatched leg (null-unsafe
        # anti-join keys would never equate NULL with its own match)
        from samza_spark.operators.rangejoin import banded_range_join

        left, right = self._frames(spark)
        out = banded_range_join(
            left, right, "lts", "rts",
            lower="INTERVAL 0 SECONDS", upper="INTERVAL 5 MINUTES",
            how="left", left_id_cols=["click_id"],
        ).collect()
        # NULL-id row matched -> exactly one row, pid present
        null_rows = [r for r in out if r.click_id is None]
        assert len(null_rows) == 1 and null_rows[0].pid == 100
        # id 7 matched, id 8 unmatched with typed NULL right side
        by_id = {r.click_id: r for r in out if r.click_id is not None}
        assert by_id[7].pid == 100
        assert by_id[8].pid is None
        assert len(out) == 3

    def test_empty_right_side_emits_all_left_once(self, spark):
        from samza_spark.operators.rangejoin import banded_range_join

        left, right = self._frames(spark)
        out = banded_range_join(
            left, right.filter("false"), "lts", "rts",
            lower="INTERVAL 0 SECONDS", upper="INTERVAL 5 MINUTES",
            how="left", left_id_cols=["click_id"],
        ).collect()
        assert len(out) == 3
        assert all(r.pid is None for r in out)


class TestIntervalParse:
    def test_simple_forms_parse_without_spark(self):
        from samza_spark.operators.rangejoin import _parse_interval_seconds

        assert _parse_interval_seconds("INTERVAL 5 MINUTES") == 300.0
        assert _parse_interval_seconds("interval 2 hours") == 7200.0
        assert _parse_interval_seconds("INTERVAL '10' SECOND") == 10.0
        assert _parse_interval_seconds("INTERVAL -30 SECONDS") == -30.0
        assert _parse_interval_seconds("INTERVAL 3650 DAYS") == 315360000.0
        # compound/fancy forms fall back to the probe
        assert _parse_interval_seconds("INTERVAL 1 HOUR 30 MINUTES") is None
        assert _parse_interval_seconds("INTERVAL '1-2' YEAR TO MONTH") is None

    def test_span_uses_parser_for_constant_intervals(self, spark):
        # no Spark job for the common case: _span_seconds must answer
        # from the parser (the r9 verdict flagged the 1-row probe)
        from samza_spark.operators.rangejoin import _span_seconds

        n_before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
        got = _span_seconds(
            spark.range(1), "INTERVAL 0 SECONDS", "INTERVAL 5 MINUTES"
        )
        n_after = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
        assert got == 300
        assert len(n_after) == len(n_before)


# -- jaccard_prefix_join: exactness-by-default + capped census ----------------


class TestPPJoinCapDiscipline:
    def _docs(self, spark):
        # 12 IDENTICAL docs: every token ties at freq 12, the prefix is
        # the lexicographically-first token for all of them -> one
        # 12-member prefix bucket, over any small cap. Dropping it
        # silently would lose 66 true J=1 pairs — the exact hazard the
        # census surfaces.
        rows = [Row(doc_id=i, text="aaa bbb ccc ddd") for i in range(12)]
        return spark.createDataFrame(rows)

    def test_default_is_uncapped_exact(self, spark):
        from samza_spark.pipeline.dedup import jaccard_prefix_join

        # identical twin docs must be found even inside a hot bucket
        df = self._docs(spark).union(
            spark.createDataFrame(
                [Row(doc_id=100, text="hot dup dup2 dup3"),
                 Row(doc_id=101, text="hot dup dup2 dup3")]
            )
        )
        pairs = jaccard_prefix_join(df, tau_num=4, tau_den=5).collect()
        assert (100, 101) in {(r.a, r.b) for r in pairs}

    def test_capped_bucket_raises_when_asked(self, spark):
        from samza_spark.pipeline.dedup import jaccard_prefix_join

        with pytest.raises(RuntimeError, match="jaccard_prefix_join"):
            jaccard_prefix_join(
                self._docs(spark), tau_num=4, tau_den=5,
                max_bucket_size=2, on_capped="raise",
            ).collect()

    def test_capped_bucket_ignore_still_runs(self, spark):
        from samza_spark.pipeline.dedup import jaccard_prefix_join

        out = jaccard_prefix_join(
            self._docs(spark), tau_num=4, tau_den=5,
            max_bucket_size=2, on_capped="ignore",
        ).collect()
        # the dropped bucket silently loses all 66 true J=1 pairs —
        # exactly why 'ignore' is opt-in and None is the default
        assert out == []


# -- expectations: label injection + idempotent routing ------------------------


class TestExpectationsHardening:
    def test_quoted_expectation_name_is_data_not_syntax(self, spark):
        from samza_spark.pipeline.governance import expectations_report

        df = spark.createDataFrame([Row(v=1), Row(v=None)])
        out = expectations_report(
            df,
            [{"name": "it's a 'quoted' name", "kind": "not_null", "col": "v"}],
        ).collect()
        assert len(out) == 1
        assert out[0].expectation == "it's a 'quoted' name"
        assert out[0].n_violations == 1

    def test_regex_derived_default_name_with_quote(self, spark):
        from samza_spark.pipeline.governance import expectations_report

        df = spark.createDataFrame([Row(v="x"), Row(v="don't")])
        out = expectations_report(
            df, [{"kind": "regex", "col": "v", "pattern": "^[a-z']+$"}]
        ).collect()
        assert out[0].n_violations == 0

    def test_streaming_route_batch_retry_is_idempotent(self, spark, tmp_path):
        # at-least-once foreachBatch: re-processing the same source with
        # NO checkpoint (the worst case the r9 ADVICE names) must not
        # duplicate rows — each batch overwrites its own partition
        from samza_spark.pipeline.governance import (
            streaming_expectations_route,
        )

        src = str(tmp_path / "src")
        ok_dir = str(tmp_path / "pass")
        qr_dir = str(tmp_path / "quarantine")
        spark.createDataFrame(
            [Row(k=1, v=10), Row(k=2, v=None)]
        ).coalesce(1).write.parquet(src)
        for _ in range(2):  # second run replays batch 0 from scratch
            stream = spark.readStream.schema("k long, v long").parquet(src)
            q = streaming_expectations_route(
                stream,
                [{"name": "v_nn", "kind": "not_null", "col": "v"}],
                ok_dir, qr_dir, checkpoint_dir=None,
            )
            q.awaitTermination(120)
        ok = spark.read.parquet(ok_dir).collect()
        qr = spark.read.parquet(qr_dir).collect()
        assert sorted(r.k for r in ok) == [1]
        assert sorted(r.k for r in qr) == [2]


# -- advisor: indentation-tree chain detection ---------------------------------


class TestAdvisorTreeWalk:
    def test_aqe_node_between_exchange_and_sort_still_detected(self):
        # the r9 ADVICE false-negative: AQE inserts AQEShuffleRead between
        # the Exchange and its Sort/Window, and ids are NOT consecutive
        from samza_spark.advisor import _count_single_partition_windows

        plan = (
            "== Physical Plan ==\n"
            "AdaptiveSparkPlan (9)\n"
            "+- Window (7)\n"
            "   +- Sort (5)\n"
            "      +- AQEShuffleRead (4)\n"
            "         +- Exchange (1)\n"
            "\n"
            "(1) Exchange\n"
            "Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]\n"
            "(4) AQEShuffleRead\n"
            "Arguments: coalesced\n"
            "(5) Sort\n"
            "Arguments: [id ASC NULLS FIRST], false, 0\n"
            "(7) Window\n"
            "Arguments: [row_number()]\n"
            "(9) AdaptiveSparkPlan\n"
        )
        assert _count_single_partition_windows(plan) == 1

    def test_sibling_branch_is_not_mistaken_for_parent(self):
        # join: the left branch ends with a SinglePartition exchange whose
        # id+1 node (right branch's Window) is NOT its parent — the old
        # id-adjacency heuristic would false-positive here
        from samza_spark.advisor import _count_single_partition_windows

        plan = (
            "== Physical Plan ==\n"
            "SortMergeJoin (10)\n"
            ":- Project (2)\n"
            ":  +- Exchange (1)\n"
            "+- Window (4)\n"
            "   +- Sort (3)\n"
            "\n"
            "(1) Exchange\n"
            "Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]\n"
            "(2) Project\n"
            "(3) Sort\n"
            "(4) Window\n"
            "(10) SortMergeJoin\n"
        )
        assert _count_single_partition_windows(plan) == 0

    def test_live_global_window_still_detected(self, spark):
        from pyspark.sql import Window

        from samza_spark.advisor import explain_formatted
        from samza_spark.advisor import _count_single_partition_windows

        df = spark.range(100).select(
            "id", F.row_number().over(Window.orderBy("id")).alias("rn")
        )
        assert _count_single_partition_windows(explain_formatted(df)) >= 1


# -- tools/check_correctness: unknown names fail loudly ------------------------


def test_check_correctness_errors_on_unknown_name():
    p = subprocess.run(
        [sys.executable, "tools/check_correctness.py",
         str(REPO_ROOT / "unused_data_dir"), "definitely_not_a_query"],
        capture_output=True, text=True, cwd=str(REPO_ROOT), timeout=300,
    )
    assert p.returncode == 2
    assert "definitely_not_a_query" in p.stderr


@pytest.mark.parametrize("selector", ["tier:canray", "family:nosuch"])
def test_check_correctness_errors_on_unknown_selector(selector):
    # a typo'd tier:/family: selector used to expand to [] (by_tier) or a
    # bare KeyError (by_family) — both silently skipped the tier the user
    # believed was checked, the same failure mode as a typo'd name
    p = subprocess.run(
        [sys.executable, "tools/check_correctness.py",
         str(REPO_ROOT / "unused_data_dir"), selector],
        capture_output=True, text=True, cwd=str(REPO_ROOT), timeout=300,
    )
    assert p.returncode == 2
    assert selector.partition(":")[2] in p.stderr
    assert "known:" in p.stderr


# -- exact-cosine batch kernel: bit-identical to the sequential HOF fold -------


class TestSequentialKernelBitExact:
    def test_kernel_doubles_equal_hof_fold_exactly(self, spark):
        # the kernel's contract is BIT equality with the zip_with/
        # aggregate fold (and therefore with the DuckDB list-fold
        # oracles): same rounded multiply, same rounded add, ascending
        # dims. Adversarial float32 inputs (mixed magnitudes so the sum
        # is order-sensitive), compared with == on the raw doubles.
        import numpy as np

        from samza_spark.pipeline.similarity import (
            _sequential_dot,
            _sequential_sq_norm,
            cosine_sim_expr,
        )

        rng = np.random.default_rng(7)
        vecs = (
            rng.standard_normal((8, 16))
            * (10.0 ** rng.integers(-6, 6, size=(8, 16)))
        ).astype(np.float32)
        rows = [
            Row(i=i, a=[float(x) for x in vecs[i]],
                b=[float(x) for x in vecs[(i + 3) % 8]])
            for i in range(8)
        ]
        df = spark.createDataFrame(rows).select(
            "i",
            F.col("a").cast("array<float>").alias("a"),
            F.col("b").cast("array<float>").alias("b"),
        )
        hof = {
            r["i"]: r["c"]
            for r in df.select(
                "i", cosine_sim_expr("a", "b").alias("c")
            ).collect()
        }
        A = vecs.astype(np.float64)
        B = vecs[[(i + 3) % 8 for i in range(8)]].astype(np.float64)
        dots = np.asarray(
            [_sequential_dot(A[i : i + 1], B[i : i + 1])[0, 0]
             for i in range(8)]
        )
        cos = dots / (_sequential_sq_norm(A) * _sequential_sq_norm(B))
        for i in range(8):
            assert cos[i] == hof[i], (i, cos[i], hof[i])

    def test_cosine_topk_empty_query_set(self, spark):
        from samza_spark.pipeline.similarity import cosine_topk

        df = spark.createDataFrame(
            [Row(vec_id=1, embedding=[1.0, 0.0])]
        ).select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
        )
        out = cosine_topk(df, df.filter("vec_id < 0"), k=3)
        assert out.count() == 0
        assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]

    def test_cosine_topk_query_cap(self, spark):
        from samza_spark.pipeline.similarity import cosine_topk

        df = spark.createDataFrame(
            [Row(vec_id=i, embedding=[1.0, float(i)]) for i in range(5)]
        ).select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
        )
        with pytest.raises(ValueError, match="max_queries"):
            cosine_topk(df, df, k=2, max_queries=3)

    def test_zero_norm_vectors_never_rank_and_never_empty_topk(self, spark):
        # NaN cosines (zero-norm corpus rows) must be dropped from the
        # candidates, not poison the kth-boundary selection: with two
        # zero vectors in a 5-row corpus and k=2, the result is still
        # the top-2 FINITE neighbors (the naive kth-partition selection
        # returned 1 row or none here)
        from samza_spark.pipeline.similarity import cosine_topk

        rows = [
            Row(vec_id=1, embedding=[1.0, 0.0]),
            Row(vec_id=2, embedding=[0.9, 0.1]),
            Row(vec_id=3, embedding=[0.0, 0.0]),  # zero norm -> NaN
            Row(vec_id=4, embedding=[0.0, 0.0]),  # zero norm -> NaN
            Row(vec_id=5, embedding=[0.5, 0.5]),
        ]
        corpus = spark.createDataFrame(rows).select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
        )
        q = corpus.filter("vec_id = 1")
        got = [
            r.neighbor_id
            for r in cosine_topk(corpus.coalesce(1), q, k=2)
            .orderBy("rank")
            .collect()
        ]
        assert got == [2, 5]
        # a zero-norm QUERY yields no rankable pairs at all (every
        # cosine NaN), and must return empty, not crash
        zq = corpus.filter("vec_id = 3")
        assert cosine_topk(corpus, zq, k=2).count() == 0

    def test_null_vector_and_null_id_rows_are_dropped(self, spark):
        # the SQL the kernel replaced folded NULL vectors to NULL
        # cosine (never ranked) and NULL ids never passed the != self-
        # filter; the kernel must drop them, not crash np.asarray/argsort
        from samza_spark.pipeline.similarity import cosine_topk

        rows = [
            Row(vec_id=1, embedding=[1.0, 0.0]),
            Row(vec_id=2, embedding=[0.9, 0.1]),
            Row(vec_id=None, embedding=[1.0, 0.0]),
            Row(vec_id=4, embedding=None),
        ]
        corpus = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        got = [
            r.neighbor_id
            for r in cosine_topk(corpus, corpus.filter("vec_id = 1"), k=3)
            .orderBy("rank")
            .collect()
        ]
        assert got == [2]

    def test_k_zero_returns_empty(self, spark):
        from samza_spark.pipeline.similarity import cosine_topk

        df = spark.createDataFrame(
            [Row(vec_id=1, embedding=[1.0, 0.0]),
             Row(vec_id=2, embedding=[0.5, 0.5])]
        ).select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
        )
        assert cosine_topk(df, df, k=0).count() == 0

    def test_hard_negatives_exposes_max_queries(self, spark):
        from samza_spark.pipeline.similarity import hard_negatives

        df = spark.createDataFrame(
            [Row(vec_id=i, label=i % 2, embedding=[1.0, float(i)])
             for i in range(4)]
        ).select(
            "vec_id", "label",
            F.col("embedding").cast("array<float>").alias("embedding"),
        )
        with pytest.raises(ValueError, match="max_queries"):
            hard_negatives(df, df, k=2, max_queries=2)
        assert hard_negatives(df, df, k=2, max_queries=10).count() > 0

    def test_boundary_ties_pick_smallest_neighbor_id(self, spark):
        # four corpus vectors IDENTICAL to the query direction (cosine
        # exactly 1.0 each) competing for k=2 slots: the tie rule must
        # keep the two smallest neighbor ids, not an argpartition-
        # arbitrary pair
        from samza_spark.pipeline.similarity import cosine_topk

        rows = [Row(vec_id=i, embedding=[2.0, 0.0]) for i in (9, 4, 7, 5)]
        corpus = spark.createDataFrame(rows).select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
        )
        q = spark.createDataFrame(
            [Row(vec_id=100, embedding=[1.0, 0.0])]
        ).select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
        )
        got = [
            (r.neighbor_id, r.rank)
            for r in cosine_topk(corpus.coalesce(1), q, k=2)
            .orderBy("rank")
            .collect()
        ]
        assert got == [(4, 1), (5, 2)]


# -- mutual information: counts oracle + float variant stays analytic ----------


class TestMutualInformationCells:
    def test_cells_are_sufficient_statistics(self, spark):
        from samza_spark.pipeline.stats import mutual_information_cells

        df = spark.createDataFrame(
            [Row(x="a", y="p"), Row(x="a", y="q"), Row(x="b", y="p"),
             Row(x="b", y="p")]
        )
        rows = {(r.x, r.y): r for r in
                mutual_information_cells(df, "x", "y").collect()}
        assert rows[("a", "p")].c == 1 and rows[("b", "p")].c == 2
        assert rows[("a", "p")].cx == 2  # marginal of x='a'
        assert rows[("a", "p")].cy == 3  # marginal of y='p'
        assert all(r.n == 4 for r in rows.values())

    def test_mi_reconstructs_from_cells(self, spark):
        # MI computed from the cells table equals the float operator's
        # output (the cells ARE the sufficient statistic)
        import math

        from samza_spark.pipeline.stats import (
            mutual_information,
            mutual_information_cells,
        )

        df = spark.createDataFrame(
            [Row(x="a", y="p")] * 6 + [Row(x="a", y="q")] * 2
            + [Row(x="b", y="p")] * 3 + [Row(x="b", y="q")] * 9
        )
        cells = mutual_information_cells(df, "x", "y").collect()
        mi_from_cells = sum(
            (r.c / r.n) * math.log(r.c * r.n / (r.cx * r.cy)) for r in cells
        )
        [mi_row] = mutual_information(df, "x", "y").collect()
        assert abs(mi_row.mi_nats - mi_from_cells) < 1e-12
