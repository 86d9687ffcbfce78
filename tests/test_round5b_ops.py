"""Round-5 (cont.) additions: global prefix sum, exact ROC AUC, label
propagation, Bellman-Ford SSSP, bitext margin mining, blocklist filter,
leakage-safe split — semantics pinned on adversarial small inputs (the
DuckDB oracle covers the sf0.01 corpus shapes)."""

import pytest

from pyspark.sql import Window, functions as F

from samza_spark.operators.rank import global_cumsum
from samza_spark.pipeline import governance, graph, sampling, similarity, stats


# ---------------------------------------------------------------------------
# global_cumsum
# ---------------------------------------------------------------------------


def test_global_cumsum_matches_single_window(spark):
    rows = [(i, (i * 7919) % 13, (i * 104729) % 101) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "id long, k long, v long")
    got = {
        r["id"]: (r["cum_v"],)
        for r in global_cumsum(
            df, [F.asc("k"), F.asc("id")], ["v"], num_partitions=7
        ).collect()
    }
    w = (
        Window.orderBy(F.asc("k"), F.asc("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["id"]: (r["cv"],)
        for r in df.select("id", F.sum("v").over(w).alias("cv")).collect()
    }
    assert got == want


def test_global_cumsum_multiple_columns(spark):
    df = spark.createDataFrame(
        [(1, 10, 1), (2, 20, 0), (3, 5, 1), (4, 7, 0)], "id long, a long, b long"
    )
    out = {
        r["id"]: (r["cum_a"], r["cum_b"])
        for r in global_cumsum(df, [F.asc("id")], ["a", "b"], num_partitions=3).collect()
    }
    assert out == {1: (10, 1), 2: (30, 1), 3: (35, 2), 4: (42, 2)}


# ---------------------------------------------------------------------------
# roc_auc
# ---------------------------------------------------------------------------


def _auc_py(pairs):
    """Brute-force pair-counting AUC with 0.5 tie credit."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    num = 0.0
    for p in pos:
        for n in neg:
            num += 1.0 if p > n else (0.5 if p == n else 0.0)
    return num / (len(pos) * len(neg))


@pytest.mark.parametrize(
    "data",
    [
        # perfect separation
        [(10, True), (9, True), (2, False), (1, False)],
        # inverted
        [(1, True), (2, True), (9, False), (10, False)],
        # heavy ties across classes
        [(5, True), (5, False), (5, True), (5, False), (7, True), (3, False)],
        # single distinct score
        [(4, True), (4, False), (4, True), (4, False)],
    ],
)
def test_roc_auc_matches_bruteforce(spark, data):
    df = spark.createDataFrame(data, "s long, y boolean")
    row = stats.roc_auc(df, "s", "y").collect()[0]
    want = _auc_py(data)
    assert row["auc"] == pytest.approx(want, abs=0)
    p = sum(1 for _, y in data if y)
    n = len(data) - p
    assert (row["n_pos"], row["n_neg"]) == (p, n)
    # the doubled numerator is exactly 2*AUC*P*N
    assert row["auc_num_x2"] == round(2 * want * p * n)


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------


def _lpa_py(arcs, n_iters=3):
    nodes = sorted({n for e in arcs for n in e})
    lab = {n: n for n in nodes}
    for _ in range(n_iters):
        cnt = {}
        for s, d in arcs:
            key = (d, lab[s])
            cnt[key] = cnt.get(key, 0) + 1
        for n in nodes:  # self vote
            key = (n, lab[n])
            cnt[key] = cnt.get(key, 0) + 1
        new = {}
        for n in nodes:
            cands = [(c, l) for (d, l), c in cnt.items() if d == n]
            best = min(((-c, l) for c, l in cands))
            new[n] = best[1]
        lab = new
    return lab


def test_label_propagation_two_cliques(spark):
    # two triangles bridged by one weak edge: communities stay separate
    pairs = [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10)]
    arcs = pairs + [(b, a) for a, b in pairs]
    df = spark.createDataFrame(arcs, "src long, dst long")
    got = {r["node"]: r["label"] for r in graph.label_propagation(df, n_iters=3).collect()}
    assert got == _lpa_py(arcs, 3)
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11] == got[12]
    assert got[1] != got[10]


def test_label_propagation_string_ids_and_no_oscillation(spark):
    # a bare edge: without the self vote synchronous LPA flips labels
    # every round; with it, both nodes settle on the min label
    pairs = [("a", "b")]
    arcs = pairs + [(b, a) for a, b in pairs]
    df = spark.createDataFrame(arcs, "src string, dst string")
    for iters in (1, 2, 3):
        got = {
            r["node"]: r["label"]
            for r in graph.label_propagation(df, n_iters=iters).collect()
        }
        assert got == {"a": "a", "b": "a"}, iters


# ---------------------------------------------------------------------------
# sssp_bellman_ford
# ---------------------------------------------------------------------------


def test_sssp_hand_graph(spark):
    # 1 ->(1) 2 ->(1) 3 ; 1 ->(5) 3 ; 3 ->(1) 4 : shortest 1..4 = 3 hops cost 3
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (1, 3, 5), (3, 4, 1)], "src long, dst long, w long"
    )
    src = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in graph.sssp_bellman_ford(edges, src, n_rounds=4).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_sssp_round_bound_and_multisource(spark):
    # chain 1-2-3-4-5, 2 rounds from {1, 5}: node 3 reached from both at 2
    pairs = [(i, i + 1, 2) for i in range(1, 5)]
    arcs = pairs + [(b, a, w) for a, b, w in pairs]
    edges = spark.createDataFrame(arcs, "src long, dst long, w long")
    src = spark.createDataFrame([(1,), (5,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in graph.sssp_bellman_ford(edges, src, n_rounds=2).collect()
    }
    assert got == {1: 0, 2: 2, 3: 4, 4: 2, 5: 0}


# ---------------------------------------------------------------------------
# bitext_margin
# ---------------------------------------------------------------------------


def test_bitext_margin_prefers_mutual_best(spark):
    # a0 aligns with b0 (identical); hub b2 is near everything -> margin
    # demotes it below the mutual-best pair
    a = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    b = spark.createDataFrame(
        [
            (10, [1.0, 0.0, 0.0]),
            (11, [0.0, 1.0, 0.0]),
            (12, [0.6, 0.6, 0.5]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = similarity.bitext_margin(a, b, k=2, top=6).collect()
    ranked = [(r["a"], r["b"]) for r in out]
    # the two identical pairs outrank every hub pair
    assert set(ranked[:2]) == {(0, 10), (1, 11)}
    # margins are integers and sorted
    margins = [r["margin_ppm"] for r in out]
    assert margins == sorted(margins, reverse=True)


# ---------------------------------------------------------------------------
# blocklist_filter
# ---------------------------------------------------------------------------


def test_blocklist_exact_and_patterns(spark):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(
            ["good.com", "ads.net", "evil.org", "ads.co", "fine.io"]
        )],
        "id long, domain string",
    )
    kept = governance.blocklist_filter(
        df, "domain", exact=["evil.org"], patterns=["ads.*"]
    )
    assert sorted(r["domain"] for r in kept.collect()) == ["fine.io", "good.com"]
    # flag mode keeps all rows and marks the blocked ones
    flagged = governance.blocklist_filter(
        df, "domain", exact=["evil.org"], patterns=["ads.*"], flag_col="blocked"
    )
    got = {r["domain"]: r["blocked"] for r in flagged.collect()}
    assert got == {
        "good.com": False,
        "ads.net": True,
        "evil.org": True,
        "ads.co": True,
        "fine.io": False,
    }


def test_blocklist_exact_only_is_anti_join(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, s string")
    kept = governance.blocklist_filter(df, "s", exact=["b"])
    assert sorted(r["s"] for r in kept.collect()) == ["a", "c"]
    assert kept.columns == ["id", "s"]
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_blocklist_pattern_literal_chars_escaped(spark):
    # '.' in a pattern is literal, not regex-any
    df = spark.createDataFrame([(1, "adsXnet"), (2, "ads.net")], "id long, s string")
    kept = governance.blocklist_filter(df, "s", patterns=["ads.net"])
    assert [r["s"] for r in kept.collect()] == ["adsXnet"]


# ---------------------------------------------------------------------------
# leakage_safe_split
# ---------------------------------------------------------------------------


def test_leakage_safe_split_components_share_split(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 21)], "doc_id long")
    # chain 1-2-3 and pair 7-8 are near-dup clusters
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "a long, b long")
    out = sampling.leakage_safe_split(
        docs, pairs, weights=(("train", 1), ("test", 1)), salt="s"
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["component"] == by_id[2]["component"] == by_id[3]["component"] == 1
    assert by_id[7]["component"] == by_id[8]["component"] == 7
    assert by_id[1]["split"] == by_id[2]["split"] == by_id[3]["split"]
    assert by_id[7]["split"] == by_id[8]["split"]
    # singletons keep their own id as component
    assert by_id[15]["component"] == 15
    # split matches plain assign_split on the component id
    plain = {
        r["doc_id"]: r["split"]
        for r in sampling.assign_split(
            spark.createDataFrame(
                [(r["doc_id"], r["component"]) for r in out],
                "doc_id long, component long",
            ),
            id_col="component",
            weights=(("train", 1), ("test", 1)),
            salt="s",
        ).collect()
    }
    assert plain == {r["doc_id"]: r["split"] for r in out}


# ---------------------------------------------------------------------------
# mixing_schedule
# ---------------------------------------------------------------------------


def test_mixing_schedule_even_interleave(spark):
    w = spark.createDataFrame([("a", 3), ("b", 1)], "source string, weight int")
    out = governance.mixing_schedule(w, n_steps=8).collect()
    by_step = {r["step"]: r["source"] for r in out}
    # a gets 6 slots, b gets 2; steps are 1..8 dense
    assert sorted(by_step) == list(range(1, 9))
    assert sum(1 for s in by_step.values() if s == "a") == 6
    # b's two slots are spread: one in each half
    b_steps = sorted(s for s, src in by_step.items() if src == "b")
    assert b_steps[0] <= 4 < b_steps[1]


def test_mixing_schedule_zero_weight_dropped(spark):
    w = spark.createDataFrame(
        [("a", 100), ("tiny", 1)], "source string, weight int"
    )
    # tiny gets (1*10) div 101 = 0 slots -> absent, no division by zero
    out = governance.mixing_schedule(w, n_steps=10).collect()
    assert {r["source"] for r in out} == {"a"}


# ---------------------------------------------------------------------------
# hysteresis_alerts
# ---------------------------------------------------------------------------


def test_hysteresis_dead_band_and_edges(spark):
    from samza_spark.pipeline import events as ev
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # values: cross hi, stay in band (no re-alert), drop below lo, cross hi again
    seq = [50.0, 90.0, 85.0, 95.0, 40.0, 10.0, 50.0, 99.0]
    for i, v in enumerate(seq):
        rows.append((i, t0 + dt.timedelta(minutes=i), 1, "m", v, ""))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    out = ev.hysteresis_alerts(df, hi=80.0, lo=20.0).collect()
    # alerts only at the two OFF->ON edges: event 1 (90.0) and event 7 (99.0)
    assert sorted(r["event_id"] for r in out) == [1, 7]
    # band values (85, 95 while ON; 40 after ON) never alert or reset


# ---------------------------------------------------------------------------
# stratified_kfold / centroid_drift / blocking_eval
# ---------------------------------------------------------------------------


def test_stratified_kfold_balanced_within_one(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(1, 48)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.stratified_kfold(df, k=5).collect()
    from collections import Counter

    for lang in ("en", "de"):
        c = Counter(r["fold"] for r in out if r["lang"] == lang)
        n = sum(c.values())
        assert set(c) <= set(range(5))
        assert max(c.values()) - min(c[f] for f in range(5)) <= 1 or n < 5


def test_centroid_drift_hand_values(spark):
    from samza_spark.pipeline.embedding_stats import centroid_drift

    a = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [1.0, 1.0])], "label int, embedding array<float>"
    )
    b = spark.createDataFrame(
        [(0, [0.0, 0.5])], "label int, embedding array<float>"
    )
    row = centroid_drift(a, b, group_col="label").collect()[0]
    # centroids: a = (1.0, 0.5), b = (0.0, 0.5) -> dist2 = 1.0 in 1e-6 units^2
    assert (row["n_a"], row["n_b"]) == (2, 1)
    assert row["dist2_scaled"] == 1_000_000**2


def test_blocking_eval_counts_and_ppm(spark):
    from samza_spark.pipeline.linkage import blocking_eval

    cand = spark.createDataFrame([(1, 2), (3, 4), (5, 6)], "a long, b long")
    # truth: (1,2) caught, (2,7) missed; (4,3) tests pair normalization
    truth = spark.createDataFrame([(2, 1), (7, 2), (4, 3)], "a long, b long")
    row = blocking_eval(cand, truth, n_docs=10).collect()[0]
    assert (row["n_cand"], row["n_true"], row["n_hit"]) == (3, 3, 2)
    assert row["rr_ppm"] == 1_000_000 - (3 * 1_000_000) // 45
    assert row["pc_ppm"] == (2 * 1_000_000) // 3
