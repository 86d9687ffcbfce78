"""Round-6 continuation operators: Bradley-Terry ratings, span
corruption, encoding QA, Wilson ranking, label aggregation, rendezvous
task assignment. Unit semantics + the plan-shape guarantees each
docstring claims."""

import math

from pyspark.sql import functions as F

from samza_spark.operators.assignment import (
    assignment_movement,
    rendezvous_assign,
)
from samza_spark.pipeline import preference, text
from samza_spark.pipeline.stats import (
    label_aggregation,
    wilson_expr,
    wilson_ranking,
)
from samza_spark.queries import QUERIES


def _plan(spark, name, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


# ---------------------------------------------------------------------------
# elo_ratings
# ---------------------------------------------------------------------------


def test_elo_ratings_order_and_normalization(spark):
    # 4 players, a > b > c > d by wins in a full round robin.
    rows = [
        ("g", 1, 2, 1), ("g", 1, 3, 1), ("g", 1, 4, 1),
        ("g", 2, 3, 2), ("g", 2, 4, 2), ("g", 3, 4, 3),
    ]
    m = spark.createDataFrame(rows, "grp string, id_a long, id_b long, winner long")
    out = preference.elo_ratings(m, iterations=3).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["wins"] == 3 and by_id[4]["wins"] == 0
    ratings = [by_id[i]["rating_micro"] for i in (1, 2, 3, 4)]
    assert ratings == sorted(ratings, reverse=True)
    assert [by_id[i]["rank"] for i in (1, 2, 3, 4)] == [1, 2, 3, 4]
    # renormalization keeps the per-group mass near n_players * 1e6
    total = sum(ratings)
    assert abs(total - 4_000_000) <= 4  # floor slack per player
    # the all-losses player hits the MM endpoint exactly
    assert by_id[4]["rating_micro"] == 0


def test_pairwise_matches_bounded_and_winner_rule(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = preference.pairwise_matches(docs, group_col="lang", top_m=4)
    rows = m.collect()
    per_group = {}
    for r in rows:
        per_group.setdefault(r["grp"], 0)
        per_group[r["grp"]] += 1
    assert all(n <= 6 for n in per_group.values())  # C(4,2)
    assert all(r["winner"] in (r["id_a"], r["id_b"]) for r in rows)


# ---------------------------------------------------------------------------
# span_corruption
# ---------------------------------------------------------------------------


def test_span_corruption_reconstructs_original(spark):
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(30))) for i in range(20)]
    rows.append((99, ""))  # empty doc must survive with zero counts
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in text.span_corruption(df, mask_pct=30).collect()}
    assert out[99]["n_tokens"] == 0 and out[99]["input_text"] == ""
    for i in range(20):
        r = out[i]
        # splice the target spans back into the input sentinels
        spans = {}
        cur = None
        for tok in r["target_text"].split(" ") if r["target_text"] else []:
            if tok.startswith("<extra_id_"):
                cur = tok
                spans[cur] = []
            else:
                spans[cur].append(tok)
        rebuilt = []
        for tok in r["input_text"].split(" ") if r["input_text"] else []:
            if tok.startswith("<extra_id_"):
                rebuilt.extend(spans[tok])
            else:
                rebuilt.append(tok)
        assert rebuilt == [f"w{i}x{j}" for j in range(30)]
        assert r["n_masked"] == sum(len(v) for v in spans.values())
        assert r["n_spans"] == len(spans)


def test_span_corruption_plan_is_map_only(spark, sf_dir):
    plan = _plan(spark, "span_corruption", sf_dir)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# mojibake_report
# ---------------------------------------------------------------------------


def test_mojibake_report_counts(spark):
    rows = [
        ("s1", "clean ascii text"),
        ("s1", "bad � repl and Ã© mojibake"),
        ("s2", "ctrl\x01char and nbsp and café"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in text.mojibake_report(df).collect()}
    assert out["s1"]["replacement_chars"] == 1
    assert out["s1"]["mojibake_hits"] == 1  # the Ã
    assert out["s2"]["control_chars"] == 1
    assert out["s2"]["nbsp_chars"] == 1
    # é (s1) + é (s2) + Ã (s1) + nbsp (s2) are the non-ASCII chars
    assert out["s1"]["non_ascii_chars"] == 3  # � + Ã + é
    assert out["s2"]["non_ascii_chars"] == 2  # nbsp + é
    assert out["s1"]["bad_ppm"] > 0 and out["s2"]["bad_ppm"] > 0


def test_mojibake_plan_single_aggregate(spark, sf_dir):
    plan = _plan(spark, "mojibake_report", sf_dir)
    assert plan.count("Exchange") == 2  # tree + details render of the one group-by node
    assert "partial" in plan.lower()  # map-side combine


# ---------------------------------------------------------------------------
# ctr_wilson
# ---------------------------------------------------------------------------


def test_wilson_matches_python_formula(spark):
    rows = [(1, 1, 1)] * 23 + [(1, 0, 1)] * 28 + [(2, 1, 1)] * 2 + [(2, 0, 1)]
    df = spark.createDataFrame(rows, "item long, s int, t int")
    out = {
        r["item"]: r
        for r in wilson_ranking(df, "item", F.col("s"), F.col("t")).collect()
    }

    def wilson(s, t, z=1.96):
        p = s / t
        z2 = z * z
        return (p + (z2 / 2.0) / t - z * math.sqrt(((p * (1.0 - p)) + (z2 / 4.0) / t) / t)) / (
            1.0 + z2 / t
        )

    assert out[1]["wilson_lb"] == wilson(23.0, 51.0)
    assert out[2]["wilson_lb"] == wilson(2.0, 3.0)
    # small-sample item with higher raw rate ranks BELOW the well-measured
    # item with decent rate: 2/3 (0.66 raw) vs 23/51 (0.45 raw)
    assert 0.0 < out[2]["wilson_lb"] < 1.0
    # monotonicity: more trials at the same rate tightens the bound upward
    big = spark.createDataFrame(
        [(3, 230, 510)], "item long, s int, t int"
    )
    big_lb = wilson_ranking(big, "item", F.col("s"), F.col("t")).collect()[0][
        "wilson_lb"
    ]
    assert big_lb > out[1]["wilson_lb"]


def test_wilson_expr_literals_are_string_casts():
    # bare numeric literals are DECIMAL in DuckDB and its DECIMAL->DOUBLE
    # cast misrounds; the shared expression must never contain one
    e = wilson_expr(1.96)
    assert "cast('" in e and "cast(1." not in e and "cast(3." not in e


# ---------------------------------------------------------------------------
# label_aggregation
# ---------------------------------------------------------------------------


def test_label_aggregation_recovers_clean_labels(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = label_aggregation(docs, alphabet=["de", "en", "es", "fr", "zh"])
    rows = out.collect()
    n = len(rows)
    agree = sum(1 for r in rows if r["final_label"] == r["true_label"])
    # 10/20/30% independent error rates: analytic majority accuracy is
    # 1 - P(>=2 wrong) = 0.902; the deterministic md5 draw at this SF
    # sits within binomial noise of it (sd ~1.3% at n=500)
    assert agree / n > 0.86
    assert all(r["total_weight"] >= r["vote_weight"] > 0 for r in rows)


def test_label_aggregation_weighted_beats_or_ties_majority(spark):
    # deterministic by construction: same input -> identical output
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(60)],
        "doc_id long, lang string",
    )
    a = label_aggregation(docs, alphabet=["de", "en"]).collect()
    b = label_aggregation(docs, alphabet=["de", "en"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# task_assignment
# ---------------------------------------------------------------------------


def _tasks(spark, n=80):
    return spark.createDataFrame(
        [(f"s{i % 5}", i // 5) for i in range(n)],
        "stream string, partition_id long",
    )


def test_rendezvous_assign_total_and_balanced(spark):
    tasks = _tasks(spark)
    out = rendezvous_assign(tasks, 8).collect()
    assert len(out) == 80  # every task assigned exactly once
    per = {}
    for r in out:
        per[r["container"]] = per.get(r["container"], 0) + 1
    assert len(per) >= 6  # no container starves badly at n=80
    assert max(per.values()) <= 3 * (80 // 8)


def test_rendezvous_minimal_movement_on_scale_out(spark):
    tasks = _tasks(spark)
    before = rendezvous_assign(tasks, 8)
    after = rendezvous_assign(tasks, 9)
    mv = assignment_movement(before, after).collect()[0]
    assert mv["n_tasks"] == 80
    # rendezvous moves ~1/9 of tasks; round-robin would move ~8/9.
    # generous bound: < 30%
    assert mv["n_moved"] / mv["n_tasks"] < 0.30
    # and only tasks that moved went to the NEW container
    a = {(r["stream"], r["partition_id"]): r["container"]
         for r in before.collect()}
    b = {(r["stream"], r["partition_id"]): r["container"]
         for r in after.collect()}
    for k in a:
        if a[k] != b[k]:
            assert b[k] == "container_8"


def test_task_assignment_plan_no_shuffle_of_containers(spark, sf_dir):
    plan = _plan(spark, "task_assignment", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# plan pins for the remaining round-6b queries
# ---------------------------------------------------------------------------


def test_elo_plan_no_cartesian_no_python(spark, sf_dir):
    plan = _plan(spark, "elo_ratings", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_ctr_wilson_single_aggregate(spark, sf_dir):
    plan = _plan(spark, "ctr_wilson", sf_dir)
    assert plan.count("Exchange") == 2  # tree + details render of the one group-by node
    assert "BatchEvalPython" not in plan


def test_label_aggregation_plan_broadcast_weights(spark, sf_dir):
    plan = _plan(spark, "label_aggregation", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastExchange" in plan  # the 3-row weight join
