"""Round-6 session-4 operators: Kaplan-Meier survival, grid spatial
join, Poisson bootstrap, compaction planner, golden record, RAKE."""

import datetime

from pyspark.sql import functions as F

from samza_spark.pipeline.events import kaplan_meier
from samza_spark.pipeline.linkage import golden_record
from samza_spark.pipeline.spatial import nearest_hub_join
from samza_spark.pipeline.stats import (
    _POISSON1_CDF_Q30,
    poisson_bootstrap,
)
from samza_spark.pipeline.text import rake_keyphrases
from samza_spark.pipeline.versioning import compaction_plan


# ------------------------------------------------------------ kaplan-meier


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


def test_kaplan_meier_hand_check(spark):
    # obs_end = day 10. gap = 2 days. u1 last seen day 3 -> event at
    # t=(3-1)=2d; u2 active to the end -> censored at t=(10-2)=8d;
    # u3 last seen day 5 (born day 5) -> event at t=0.
    rows = [
        (1, _ts(1)), (1, _ts(3)),
        (2, _ts(2)), (2, _ts(10)),
        (3, _ts(5)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = kaplan_meier(
        df, churn_gap_us=2 * 86_400_000_000, bin_us=86_400_000_000
    ).collect()
    by_t = {r["t_bin"]: r for r in out}
    assert set(by_t) == {0, 2, 8}
    assert by_t[0]["d_events"] == 1 and by_t[0]["n_risk"] == 3
    assert by_t[2]["d_events"] == 1 and by_t[2]["n_risk"] == 2
    assert by_t[8]["c_censored"] == 1 and by_t[8]["n_risk"] == 1


def test_kaplan_meier_risk_set_is_decreasing_and_conserves(spark):
    rows = [(i % 7, _ts(1 + i % 9, i % 24)) for i in range(60)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = (
        kaplan_meier(df, churn_gap_us=86_400_000_000, bin_us=3_600_000_000)
        .orderBy("t_bin")
        .collect()
    )
    n_users = 7
    assert out[0]["n_risk"] == n_users
    seen = 0
    for r in out:
        assert r["n_risk"] == n_users - seen
        seen += r["d_events"] + r["c_censored"]
    assert seen == n_users


# ------------------------------------------------------------ spatial join


def test_nearest_hub_matches_bruteforce(spark):
    import itertools

    pts = [(i, (i * 37) % 500, (i * 91) % 500) for i in range(200)]
    hubs = [(j, (j * 131) % 500, (j * 53) % 500) for j in range(10)]
    pdf = spark.createDataFrame(pts, "point_id long, x long, y long")
    hdf = spark.createDataFrame(hubs, "hub_id long, hx long, hy long")
    out = {
        r["point_id"]: (r["hub_id"], r["d2"])
        for r in nearest_hub_join(pdf, hdf, radius=64, extent=512).collect()
    }
    expect = {}
    for pid, x, y in pts:
        best = None
        for hid, hx, hy in hubs:
            d2 = (x - hx) ** 2 + (y - hy) ** 2
            if d2 <= 64 * 64 and (best is None or (d2, hid) < best):
                best = (d2, hid)
        if best is not None:
            expect[pid] = (best[1], best[0])
    assert out == expect


def test_nearest_hub_edge_cells_not_clamped(spark):
    # hub at the grid corner: its out-of-range neighbor cells must be
    # dropped, not clamped (clamping would duplicate the cell key).
    pdf = spark.createDataFrame([(1, 0, 0)], "point_id long, x long, y long")
    hdf = spark.createDataFrame([(7, 1, 1)], "hub_id long, hx long, hy long")
    out = nearest_hub_join(pdf, hdf, radius=16, extent=64).collect()
    assert len(out) == 1 and out[0]["hub_id"] == 7 and out[0]["d2"] == 2


# --------------------------------------------------------- poisson bootstrap


def test_poisson_thresholds_are_poisson1_cdf():
    import math

    acc, fact = 0.0, 1
    for k, t in enumerate(_POISSON1_CDF_Q30):
        if k > 0:
            fact *= k
        acc += math.exp(-1.0) / fact
        assert t == int(acc * (1 << 30))
    assert _POISSON1_CDF_Q30[-1] > (1 << 30) * 0.9999


def test_poisson_bootstrap_replicates_cover_the_mean(spark):
    rows = [(i, 100.0 + (i % 11)) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, v double")
    out = poisson_bootstrap(df, "k", "v", n_reps=16).collect()
    assert len(out) == 16
    true_mean_units = sum(int(v * 100) for _, v in rows) // len(rows)
    means = [r["mean_units"] for r in out]
    # every replicate mean is near the true mean; replicates vary
    assert all(abs(m - true_mean_units) < 100 for m in means)
    assert len(set(means)) > 1
    # n_eff concentrates around n (Poisson(1) sum)
    for r in out:
        assert 1800 < r["n_eff"] < 2200


def test_poisson_bootstrap_single_pass_plan(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(10)], "k long, v double")
    plan = poisson_bootstrap(df, "k", "v", n_reps=8)._jdf.queryExecution().executedPlan().toString()
    # the only Generate is the B-row unpivot ABOVE the aggregate; a
    # Generate below the aggregate would be a corpus explode
    assert "Generate" not in plan.split("HashAggregate", 1)[1]
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------- compaction


def test_compaction_plan_first_byte_rule(spark):
    rows = [
        ("a", 1, 120), ("a", 2, 100), ("a", 3, 50), ("a", 4, 400),
        ("b", 1, 90),
    ]
    df = spark.createDataFrame(rows, "source string, file_id long, bytes long")
    out = {
        (r["source"], r["bin"]): (r["n_files"], r["total_bytes"], r["first_file"], r["last_file"])
        for r in compaction_plan(df, target_bytes=200).collect()
    }
    # a: offsets 0,120,220,270 -> bins 0,0,1,1 ; b: offset 0 -> bin 0
    assert out == {
        ("a", 0): (2, 220, 1, 2),
        ("a", 1): (2, 450, 3, 4),
        ("b", 0): (1, 90, 1, 1),
    }


# ------------------------------------------------------------ golden record


def test_golden_record_field_level_survivorship(spark):
    rows = [
        # entity 1: high-prio source has null email -> low prio supplies it
        (1, 2, "Alice", None), (1, 1, "ALICE", "a@x.com"),
        # entity 2: all-null field stays null
        (2, 2, None, None), (2, 1, None, None),
    ]
    df = spark.createDataFrame(rows, "id long, prio int, name string, email string")
    out = {r["id"]: r for r in golden_record(df, "id", "prio", ["name", "email"]).collect()}
    assert out[1]["name"] == "Alice" and out[1]["email"] == "a@x.com"
    assert out[2]["name"] is None and out[2]["email"] is None
    assert out[1]["n_sources"] == 2


# --------------------------------------------------------------------- rake


def test_rake_scores_multiword_phrases_above_common_words(spark):
    docs = [
        ("deep learning is the best",),
        ("deep learning of deep networks",),
        ("the networks",),
    ]
    df = spark.createDataFrame(docs, "text string")
    out = rake_keyphrases(df, top_k=10).collect()
    by_phrase = {r["phrase"]: r for r in out}
    # 'deep learning' appears twice and outranks single words
    assert by_phrase["deep learning"]["n_occ"] == 2
    top = out[0]
    assert top["phrase"] in {"deep learning", "deep networks"}
    # stopwords never appear inside phrases
    for r in out:
        assert not set(r["phrase"].split()) & {"is", "the", "of", "a"}


# ---------------------------------------------------------- kmv set ops


def test_kmv_set_ops_exact_below_k(spark):
    from samza_spark.pipeline.sketches import kmv_set_ops, kmv_table

    a = spark.createDataFrame([(i,) for i in range(30)], "k long")
    b = spark.createDataFrame([(i,) for i in range(20, 50)], "k long")
    sa = kmv_table(a, "k", k=64, salt="t")
    sb = kmv_table(b, "k", k=64, salt="t")
    r = kmv_set_ops(sa, sb, k=64).collect()[0]
    # below k everything is exact: |A u B| = 50, |A n B| = 10
    assert r["union_estimate"] == 50
    assert r["overlap"] == 10
    assert r["jaccard_ppm"] == 10 * 1_000_000 // 50
    assert r["intersect_estimate"] == 10


def test_kmv_set_ops_estimates_above_k(spark):
    from samza_spark.pipeline.sketches import kmv_set_ops, kmv_table

    a = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    b = spark.createDataFrame([(i,) for i in range(1000, 3000)], "k long")
    sa = kmv_table(a, "k", k=128, salt="t")
    sb = kmv_table(b, "k", k=128, salt="t")
    r = kmv_set_ops(sa, sb, k=128).collect()[0]
    # true union 3000, jaccard 1000/3000
    assert abs(r["union_estimate"] - 3000) < 600
    assert abs(r["jaccard_ppm"] - 333_333) < 120_000
    assert abs(r["intersect_estimate"] - 1000) < 500


# ---------------------------------------------------------- dp histogram


def test_dp_histogram_noise_bounded_and_threshold(spark):
    from samza_spark.pipeline.governance import _DGEOM_CDF_Q30, dp_histogram

    assert len(_DGEOM_CDF_Q30) == 16
    assert _DGEOM_CDF_Q30 == sorted(_DGEOM_CDF_Q30)
    rows = [(f"cat{i % 10}",) for i in range(500)] + [("rare",)]
    df = spark.createDataFrame(rows, "c string")
    out = {r["c"]: r["released_count"] for r in dp_histogram(df, ["c"], threshold=3).collect()}
    # noise is clipped to [-8, 8]
    for c, n in out.items():
        true = 50 if c != "rare" else 1
        assert abs(n - true) <= 8
    # the 1-count category cannot survive a threshold of 3 unless noise >= 2;
    # deterministically check against its released value
    if "rare" in out:
        assert out["rare"] >= 3


def test_dp_histogram_deterministic(spark):
    from samza_spark.pipeline.governance import dp_histogram

    df = spark.createDataFrame([(f"c{i % 5}",) for i in range(100)], "c string")
    r1 = sorted(map(tuple, dp_histogram(df, ["c"]).collect()))
    r2 = sorted(map(tuple, dp_histogram(df, ["c"]).collect()))
    assert r1 == r2


# ------------------------------------------------------------- kneser-ney


def test_kneser_ney_hand_check(spark):
    from samza_spark.pipeline.text import kneser_ney_stats

    docs = [("a b c",), ("a b d",), ("e b",)]
    df = spark.createDataFrame(docs, "text string")
    # bigrams: (a,b)x2, (b,c), (b,d), (e,b) -> 4 types
    out = {r["word"]: r for r in kneser_ney_stats(df).collect()}
    assert out["a"]["c_total"] == 2 and out["a"]["n_right"] == 1
    assert out["b"]["c_total"] == 2 and out["b"]["n_right"] == 2
    # 'b' has 2 distinct left contexts (a, e) of 4 bigram types
    assert out["b"]["n_left"] == 2
    assert out["b"]["pcont_ppm"] == 2 * 1_000_000 // 4
    # lambda(a) = (3 * 1 * 1e6) // (4 * 2)
    assert out["a"]["lambda_ppm"] == 3_000_000 // 8


# ------------------------------------------------------------ markov eval


def test_markov_eval_learns_deterministic_chain(spark):
    import datetime

    from samza_spark.pipeline.events import markov_eval

    # every user cycles a -> b -> a ...; the predictor must learn it and
    # score 100% on held-out users
    rows = []
    eid = 0
    for u in range(20):
        for i in range(10):
            rows.append(
                (eid, u, datetime.datetime(2024, 1, 1, 0, i), "ab"[i % 2])
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {r["prev_type"]: r for r in markov_eval(df, test_mod=4).collect()}
    assert out["a"]["predicted"] == "b" and out["a"]["acc_ppm"] == 1_000_000
    assert out["b"]["predicted"] == "a" and out["b"]["acc_ppm"] == 1_000_000


# ------------------------------------------------------- fifo allocation


def test_fifo_allocation_hand_check(spark):
    from samza_spark.pipeline.events import fifo_allocation

    demand = spark.createDataFrame(
        [(1, 4, 1), (1, 3, 2), (1, 5, 3), (2, 2, 1)],
        "k long, qty long, seq long",
    )
    stock = spark.createDataFrame([(1, 6), (2, 10)], "k long, stock long")
    out = {
        (r["k"], r["seq"]): (r["filled_qty"], r["short_qty"])
        for r in fifo_allocation(
            demand, stock, "k", "qty", "stock", ["seq"]
        ).collect()
    }
    # key 1: stock 6 -> line1 fills 4, line2 fills 2 (short 1), line3 short 5
    assert out[(1, 1)] == (4, 0)
    assert out[(1, 2)] == (2, 1)
    assert out[(1, 3)] == (0, 5)
    assert out[(2, 1)] == (2, 0)


# --------------------------------------------------------------- qini curve


def test_qini_curve_perfect_uplift_model(spark):
    from samza_spark.pipeline.stats import qini_curve

    # treated units 0..49 convert iff score high (units 0..24);
    # control units never convert -> qini grows only on treated positives
    rows = []
    for u in range(100):
        treated = u < 50
        score = 100 - u  # descending with u
        pos = treated and u < 25
        rows.append((u, score, int(pos), int(treated)))
    df = spark.createDataFrame(rows, "u long, s long, p long, t long")
    out = qini_curve(
        df, key_col="u", score_col="max(s)", positive_expr="p = 1",
        treatment_expr="t = 1", n_bins=4,
    ).collect()
    assert [r["bin"] for r in out] == [1, 2, 3, 4]
    last = out[-1]
    assert last["cum_n_t"] == 50 and last["cum_n_c"] == 50
    assert last["cum_pos_t"] == 25 and last["cum_pos_c"] == 0
    # with zero control positives, qini_num = cum_pos_t * cum_n_c
    for r in out:
        assert r["qini_num"] == r["cum_pos_t"] * r["cum_n_c"]


# ------------------------------------------------------ clustering coefficient


def test_clustering_coefficients_hand_check(spark):
    from samza_spark.pipeline.graph import clustering_coefficients

    # triangle 1-2-3 plus pendant 3-4: node 3 has deg 3, 1 triangle ->
    # 2*1/(3*2) = 1/3; nodes 1,2 have coeff 1; node 4 excluded (deg 1)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "a long, b long"
    )
    out = {r["node"]: r for r in clustering_coefficients(edges).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["coeff_ppm"] == 1_000_000
    assert out[2]["coeff_ppm"] == 1_000_000
    assert out[3]["coeff_ppm"] == 2_000_000 // 6


# ------------------------------------------------------------- modularity


def test_community_modularity_two_cliques(spark):
    from samza_spark.pipeline.graph import community_modularity

    # two disjoint triangles, perfectly partitioned: m=6,
    # each community: e_c=3, d_c=6 -> q_num = 4*6*3 - 36 = 36
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6)], "a long, b long"
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)], "node long, label long"
    )
    out = {r["label"]: r for r in community_modularity(edges, labels).collect()}
    for lab in (1, 4):
        assert out[lab]["e_internal"] == 3
        assert out[lab]["d_total"] == 6
        assert out[lab]["m_edges"] == 6
        assert out[lab]["q_num"] == 4 * 6 * 3 - 36
    # Q = sum(q_num) / (4 m^2) = 72/144 = 0.5, the textbook value
    assert sum(r["q_num"] for r in out.values()) == 72


def test_community_modularity_cross_edges_not_internal(spark):
    from samza_spark.pipeline.graph import community_modularity

    edges = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "node long, label long"
    )
    out = {r["label"]: r for r in community_modularity(edges, labels).collect()}
    assert out[1]["e_internal"] == 1 and out[3]["e_internal"] == 0
    assert out[3]["n_nodes"] == 1 and out[3]["d_total"] == 1


# -------------------------------------------------------------- symspell


def test_symspell_pairs_equal_bruteforce(spark):
    from samza_spark.pipeline.linkage import symspell_pairs

    words = [
        "cat", "cart", "bat", "cap", "dog", "dig", "dg", "act", "tac",
        "hello", "hallo", "hell", "shell",
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        (r["w1"], r["w2"]) for r in symspell_pairs(df).collect()
    }

    def lev(a, b):
        import functools

        @functools.lru_cache(None)
        def d(i, j):
            if i == 0:
                return j
            if j == 0:
                return i
            return min(
                d(i - 1, j) + 1,
                d(i, j - 1) + 1,
                d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
            )

        return d(len(a), len(b))

    expect = {
        (a, b)
        for i, a in enumerate(sorted(words))
        for b in sorted(words)[i + 1:]
        if lev(a, b) <= 1
    }
    assert got == expect
    # transposition pairs (distance 2) must NOT appear
    assert ("act", "cat") not in got and ("act", "tac") not in got


# ---------------------------------------------------------- interval merge


def test_interval_merge_hand_check(spark):
    from samza_spark.pipeline.events import interval_merge

    iv = spark.createDataFrame(
        [
            # key 1: [0,10] + [5,8] (contained) + [10,20] (touching) -> one
            # island; [25,30] separate
            (1, 0, 10), (1, 5, 8), (1, 10, 20), (1, 25, 30),
            # key 2: nested long interval swallows later short ones
            (2, 0, 100), (2, 10, 20), (2, 99, 101),
        ],
        "key long, start_us long, end_us long",
    )
    out = {
        (r["key"], r["island"]): (r["start_us"], r["end_us"], r["n_merged"])
        for r in interval_merge(iv).collect()
    }
    assert out == {
        (1, 1): (0, 20, 3),
        (1, 2): (25, 30, 1),
        (2, 1): (0, 101, 3),
    }


# -------------------------------------------------------------- pr curve


def test_pr_curve_perfect_separation(spark):
    from samza_spark.pipeline.stats import pr_curve

    # scores 100..91 are positive, 50..41 negative -> precision 1.0
    # until recall 1.0, then decays
    rows = [(i, 100 - i, 1) for i in range(10)] + [
        (100 + i, 50 - i, 0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "u long, s long, p long")
    out = pr_curve(df, "u", "max(s)", "p = 1").collect()
    assert len(out) == 20
    top = [r for r in out if r["threshold"] >= 91]
    assert all(r["precision_ppm"] == 1_000_000 for r in top)
    assert top[-1]["recall_ppm"] == 1_000_000
    last = out[-1]
    assert last["n_predicted"] == 20 and last["tp"] == 10
    assert last["precision_ppm"] == 500_000


# ------------------------------------------------------------------ dbscan


def test_grid_neighbor_pairs_equal_bruteforce(spark):
    from samza_spark.pipeline.spatial import grid_neighbor_pairs

    pts = [(i, (i * 197) % 1000, (i * 313) % 1000) for i in range(150)]
    df = spark.createDataFrame(pts, "point_id long, x long, y long")
    got = {
        (r["a"], r["b"])
        for r in grid_neighbor_pairs(df, eps=100, extent=4096).collect()
    }
    expect = {
        (a, b)
        for a, xa, ya in pts
        for b, xb, yb in pts
        if a != b and (xa - xb) ** 2 + (ya - yb) ** 2 <= 100 * 100
    }
    assert got == expect


def test_dbscan_hand_check(spark):
    from samza_spark.pipeline.spatial import dbscan

    # dense blob around (10,10): 5 points -> all core (eps 5, minPts 4);
    # point at (16,10) is border (1 core neighbor, only 2 total);
    # point at (100,100) is noise
    pts = [
        (1, 10, 10), (2, 11, 10), (3, 10, 11), (4, 12, 11), (5, 11, 12),
        (6, 16, 10),
        (7, 100, 100),
    ]
    df = spark.createDataFrame(pts, "point_id long, x long, y long")
    out = {r["point_id"]: (r["cluster"], r["is_core"]) for r in dbscan(df, eps=5, min_pts=4).collect()}
    assert 7 not in out  # noise dropped
    assert out[6] == (1, 0)  # border, attached to the blob's min core id
    for p in (1, 2, 3, 4, 5):
        assert out[p] == (1, 1)


def test_dbscan_chain_component_converges(spark):
    from samza_spark.pipeline.spatial import dbscan

    # a 60-point chain spaced 4 apart: every interior point has 2
    # neighbors at eps=5... use minPts=3 so the chain is one cluster;
    # diameter 60 >> min-label cap would under-converge
    pts = [(i, 4 * i, 0) for i in range(60)]
    df = spark.createDataFrame(pts, "point_id long, x long, y long")
    out = dbscan(df, eps=5, min_pts=3).collect()
    clusters = {r["cluster"] for r in out}
    # endpoints (2 neighbors incl. self) are border, so the min CORE id
    # is 1 -- one cluster spanning the whole 60-point chain either way
    assert clusters == {1}
    assert len(out) == 60
    border = {r["point_id"] for r in out if r["is_core"] == 0}
    assert border == {0, 59}


# --------------------------------------------------------------------- emd


def test_emd_1d_hand_check(spark):
    from samza_spark.pipeline.stats import emd_1d

    # a: mass at 0 and 10; b: same mass shifted +1 -> EMD = 1
    rows = [(0, "a"), (10, "a"), (1, "b"), (11, "b")]
    df = spark.createDataFrame(rows, "v long, g string")
    r = emd_1d(df, "v", "g").collect()[0]
    assert r["n_a"] == 2 and r["n_b"] == 2
    # numerator over n_a*n_b = 4: emd = 1 -> num = 4
    assert r["emd_num"] == 4


def test_emd_1d_magnitude_aware(spark):
    from samza_spark.pipeline.stats import emd_1d

    # small shift of much mass vs large shift of little mass: same KS
    # would differ; EMD ranks the big shift higher
    near = [(0, "a")] * 10 + [(1, "b")] * 10
    far = [(0, "a")] * 10 + [(100, "b")] * 10
    d_near = emd_1d(
        spark.createDataFrame(near, "v long, g string"), "v", "g"
    ).collect()[0]
    d_far = emd_1d(
        spark.createDataFrame(far, "v long, g string"), "v", "g"
    ).collect()[0]
    assert d_far["emd_num"] > d_near["emd_num"]
    assert d_near["emd_num"] == 100  # 1 * (10*10)
    assert d_far["emd_num"] == 100 * 100


# ------------------------------------------- poisson bootstrap mergeability


def test_poisson_bootstrap_is_mergeable(spark):
    from samza_spark.pipeline.stats import poisson_bootstrap

    rows = [(i, float(i % 50)) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, v double")
    whole = {
        r["rep"]: (r["n_eff"], r["sum_units"])
        for r in poisson_bootstrap(df, "k", "v", n_reps=8).collect()
    }
    h1 = poisson_bootstrap(df.filter("k % 2 = 0"), "k", "v", n_reps=8).collect()
    h2 = poisson_bootstrap(df.filter("k % 2 = 1"), "k", "v", n_reps=8).collect()
    folded = {}
    for r in list(h1) + list(h2):
        n, s = folded.get(r["rep"], (0, 0))
        folded[r["rep"]] = (n + r["n_eff"], s + r["sum_units"])
    # per-row deterministic weights make replicate sums exactly additive
    assert folded == whole


# ------------------------------------------------------------ window funnel


def test_window_funnel_hand_check(spark):
    import datetime

    from samza_spark.pipeline.events import window_funnel

    def ts(h, m=0):
        return datetime.datetime(2024, 1, 1, h, m)

    rows = [
        (1, ts(0), "view"), (1, ts(0, 10), "click"), (1, ts(0, 20), "purchase"),
        (2, ts(0), "view"), (2, ts(0, 10), "click"),
        (3, ts(0), "view"), (3, ts(0, 50), "purchase"),  # gap: no click
        (4, ts(0), "click"), (4, ts(0, 10), "purchase"),  # no step-1
        (5, ts(0), "view"),
        # chain crosses the 1h window -> only level 1
        (6, ts(0), "view"), (6, ts(2), "click"),
        # a LATER view restarts the window and completes
        (7, ts(0), "view"), (7, ts(2), "view"),
        (7, ts(2, 30), "click"), (7, ts(2, 45), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        r["user_id"]: r["level"]
        for r in window_funnel(
            df, ["view", "click", "purchase"], 3_600_000_000
        ).collect()
    }
    assert out == {1: 3, 2: 2, 3: 1, 4: 0, 5: 1, 6: 1, 7: 3}


def test_window_funnel_strict_order_within_window(spark):
    import datetime

    from samza_spark.pipeline.events import window_funnel

    # purchase BEFORE click must not count: view@0, purchase@10, click@20
    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 0), "view"),
        (1, datetime.datetime(2024, 1, 1, 0, 10), "purchase"),
        (1, datetime.datetime(2024, 1, 1, 0, 20), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = window_funnel(df, ["view", "click", "purchase"], 3_600_000_000).collect()
    assert out[0]["level"] == 2  # view -> click, but no purchase after click


# ------------------------------------------------------------ count sketch


def test_count_sketch_f2_exact_and_close(spark):
    from samza_spark.pipeline.sketches import count_sketch_f2

    # skewed keys: F2 dominated by the hot key
    rows = [(i % 40,) for i in range(400)] + [(999,)] * 100
    df = spark.createDataFrame(rows, "k long")
    r = count_sketch_f2(df, "k", depth=5, width=128).collect()[0]
    exact = 40 * 10 * 10 + 100 * 100
    assert r["f2_exact"] == exact
    # median-of-5 unbiased estimator: within ~35% on this size
    assert abs(r["f2_estimate"] - exact) <= exact * 0.35
    assert r["err_ppm"] == abs(r["f2_estimate"] - exact) * 1_000_000 // exact


def test_count_sketch_f2_exact_when_width_large(spark):
    from samza_spark.pipeline.sketches import count_sketch_f2

    # few keys + wide sketch -> collisions vanish and the estimate is
    # EXACT per depth (signs square away)
    df = spark.createDataFrame([(i % 5,) for i in range(50)], "k long")
    r = count_sketch_f2(df, "k", depth=5, width=4096).collect()[0]
    assert r["f2_estimate"] == r["f2_exact"] == 5 * 100


# ------------------------------------------------------------ mann-whitney


def test_mann_whitney_hand_check_with_ties(spark):
    from samza_spark.pipeline.stats import mann_whitney_u

    # a = [1, 2, 2], b = [2, 3]: ranks 1, 2-3-4 tied (midrank 3), 5
    # R_A = 1 + 3 + 3 = 7 -> U_A = 7 - 6 = 1 -> u2_a = 2
    rows = [(1, "a"), (2, "a"), (2, "a"), (2, "b"), (3, "b")]
    df = spark.createDataFrame(rows, "v long, g string")
    r = mann_whitney_u(df, "v", "g").collect()[0]
    assert (r["n_a"], r["n_b"]) == (3, 2)
    assert r["u2_a"] == 2
    assert r["u2_b"] == 2 * 3 * 2 - 2
    assert r["auc_ppm"] == 2 * 1_000_000 // 12


def test_mann_whitney_stochastic_dominance(spark):
    from samza_spark.pipeline.stats import mann_whitney_u

    # b strictly above a -> AUC(a over b) = 0; flip -> 1e6
    rows = [(i, "a") for i in range(10)] + [(100 + i, "b") for i in range(10)]
    df = spark.createDataFrame(rows, "v long, g string")
    r = mann_whitney_u(df, "v", "g").collect()[0]
    assert r["auc_ppm"] == 0 and r["u2_a"] == 0
    r2 = mann_whitney_u(
        df, "v", "case when g = 'a' then 'b' else 'a' end"
    ).collect()[0]
    assert r2["auc_ppm"] == 1_000_000


# ---------------------------------------------------------------- mcnemar


def test_mcnemar_hand_check(spark):
    from samza_spark.pipeline.stats import mcnemar_paired

    # truth all True; A right on 1-6 (b-side rights: 1-4,7):
    # units: (y, pa, pb)
    rows = [
        (True, True, True),    # both right
        (True, True, False),   # b
        (True, True, False),   # b
        (True, True, False),   # b
        (True, False, True),   # c
        (True, False, False),  # both wrong
    ]
    df = spark.createDataFrame(rows, "y boolean, pa boolean, pb boolean")
    r = mcnemar_paired(df, "y", "pa", "pb").collect()[0]
    assert (r["n"], r["n_both_right"], r["n_both_wrong"]) == (6, 1, 1)
    assert (r["b"], r["c"]) == (3, 1)
    assert r["stat_micro"] == (3 - 1) ** 2 * 1_000_000 // 4
    assert r["stat_corrected_micro"] == (2 - 1) ** 2 * 1_000_000 // 4


def test_mcnemar_no_discordance(spark):
    from samza_spark.pipeline.stats import mcnemar_paired

    rows = [(True, True, True), (False, False, False)]
    df = spark.createDataFrame(rows, "y boolean, pa boolean, pb boolean")
    r = mcnemar_paired(df, "y", "pa", "pb").collect()[0]
    assert r["b"] == r["c"] == 0 and r["stat_micro"] == 0


# -------------------------------------------------- count-sketch streaming


def test_count_sketch_merge_equals_whole(spark):
    from samza_spark.pipeline.sketches import (
        count_min_merge,
        count_sketch_table,
    )

    df = spark.createDataFrame([(f"k{i % 9}", i) for i in range(400)], "k string, i long")
    whole = count_sketch_table(df, "k", depth=3, width=64)
    h1 = count_sketch_table(df.filter("i % 2 = 0"), "k", depth=3, width=64)
    h2 = count_sketch_table(df.filter("i % 2 = 1"), "k", depth=3, width=64)
    merged = count_min_merge(h1, h2)
    w = {(r["depth"], r["bucket"]): r["c"] for r in whole.collect()}
    m = {(r["depth"], r["bucket"]): r["c"] for r in merged.collect()}
    # linearity: exact cell-wise equality (signed contributions sum)
    assert {k: v for k, v in w.items() if v != 0} == {
        k: v for k, v in m.items() if v != 0
    }


def test_streaming_count_sketch_equals_batch(spark, tmp_path):
    import pyspark.sql.functions as F

    from samza_spark.pipeline.sketches import (
        count_sketch_table,
        streaming_count_sketch,
    )

    src = tmp_path / "src"
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [(f"k{i % 7}",) for i in range(120)]
    rows2 = [(f"k{i % 5}",) for i in range(80)]
    spark.createDataFrame(rows1, "k string").write.mode("overwrite").parquet(
        str(src / "w1")
    )
    stream = spark.readStream.schema("k string").parquet(str(src / "w1"))
    streaming_count_sketch(
        stream, "k", state, depth=3, width=64, checkpoint_dir=ckpt
    ).awaitTermination(120)
    spark.createDataFrame(rows2, "k string").write.mode("append").parquet(
        str(src / "w1")
    )
    stream2 = spark.readStream.schema("k string").parquet(str(src / "w1"))
    streaming_count_sketch(
        stream2, "k", state, depth=3, width=64, checkpoint_dir=ckpt
    ).awaitTermination(120)

    streamed = {
        (r["depth"], r["bucket"]): r["c"]
        for r in spark.read.parquet(state).collect()
    }
    batch = {
        (r["depth"], r["bucket"]): r["c"]
        for r in count_sketch_table(
            spark.createDataFrame(rows1 + rows2, "k string"), "k", depth=3, width=64
        ).collect()
    }
    assert {k: v for k, v in streamed.items() if v != 0} == {
        k: v for k, v in batch.items() if v != 0
    }
