"""Round-6 session-3 operators: count-min sketch, Fellegi-Sunter
linkage, disorder audit, encoding profile, CUPED."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from samza_spark.pipeline import sketches
from samza_spark.pipeline.events import disorder_audit
from samza_spark.pipeline.linkage import fellegi_sunter
from samza_spark.pipeline.quality import encoding_profile
from samza_spark.pipeline.stats import cuped_adjust


# ---------------------------------------------------------------- count-min


def test_count_min_never_undercounts_and_is_tight_for_heavy_keys(spark):
    rows = [(f"k{i % 20}",) for i in range(400)] + [("hot",)] * 100
    df = spark.createDataFrame(rows, "k string")
    sk = sketches.count_min_table(df, "k", depth=4, width=64)
    est = sketches.count_min_estimate(sk, df.select("k"), "k", depth=4, width=64)
    exact = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    for r in est.collect():
        assert r["cm_estimate"] >= exact[r["k"]]
    hot = {r["k"]: r["cm_estimate"] for r in est.collect()}["hot"]
    # eps = e/w ~ 0.042; N = 500 -> overcount bound ~21 whp
    assert hot - 100 <= 40


def test_count_min_merge_equals_whole(spark):
    df = spark.createDataFrame([(f"k{i % 7}", i) for i in range(300)], "k string, i long")
    whole = sketches.count_min_table(df, "k", depth=3, width=32)
    h1 = sketches.count_min_table(df.filter("i % 2 = 0"), "k", depth=3, width=32)
    h2 = sketches.count_min_table(df.filter("i % 2 = 1"), "k", depth=3, width=32)
    merged = sketches.count_min_merge(h1, h2)
    w = {(r["depth"], r["bucket"]): r["c"] for r in whole.collect()}
    m = {(r["depth"], r["bucket"]): r["c"] for r in merged.collect()}
    assert w == m  # linearity: exact cell-wise equality


def test_count_min_weighted(spark):
    df = spark.createDataFrame([("a", 5), ("a", 7), ("b", 1)], "k string, w long")
    sk = sketches.count_min_table(df, "k", depth=2, width=16, weight_col="w")
    est = sketches.count_min_estimate(
        sk, df.select("k"), "k", depth=2, width=16
    )
    vals = {r["k"]: r["cm_estimate"] for r in est.collect()}
    assert vals["a"] >= 12 and vals["b"] >= 1


# ---------------------------------------------------------- Fellegi-Sunter


def test_fellegi_sunter_weights_and_decision(spark):
    a = spark.createDataFrame(
        [(1, 10, "x", "n1"), (2, 10, "y", "n2")], "id long, blk long, f1 string, f2 string"
    )
    b = spark.createDataFrame(
        [(101, 10, "x", "n1"), (102, 10, "z", "n2")], "id long, blk long, f1 string, f2 string"
    )
    out = fellegi_sunter(
        a,
        b,
        id_a="id",
        id_b="id",
        block_cols=["blk"],
        fields=[("f1", "A.f1", "B.f1"), ("f2", "A.f2", "B.f2")],
        m_permille={"f1": 900, "f2": 900},
        u_permille={"f1": 100, "f2": 10},
        threshold_ratio=(100, 1),
    )
    rows = {(r["a_id"], r["b_id"]): r for r in out.collect()}
    assert len(rows) == 4  # 2x2 within the block
    full = rows[(1, 101)]
    assert full["pattern"] == "11"
    assert full["w_num"] == 900 * 900 and full["w_den"] == 100 * 10
    assert full["is_match"]
    # agreement on f2 only (rare value): 100/990 * 900/10
    partial = rows[(2, 102)]
    assert partial["pattern"] == "01"
    assert partial["w_num"] == 100 * 900 and partial["w_den"] == 900 * 10
    assert not rows[(1, 102)]["is_match"]


def test_fellegi_sunter_null_safe_agreement(spark):
    a = spark.createDataFrame([(1, 1, None)], "id long, blk long, f string")
    b = spark.createDataFrame([(2, 1, None)], "id long, blk long, f string")
    out = fellegi_sunter(
        a, b, "id", "id", ["blk"],
        [("f", "A.f", "B.f")], {"f": 500}, {"f": 500},
    ).collect()
    assert out[0]["pattern"] == "1"  # null <=> null agrees


# ----------------------------------------------------------- disorder audit


def test_disorder_audit_hand_check(spark):
    # arrival order 1..5; ts sequence with one late arrival (seq 3)
    rows = [
        ("a", 1, 1000),
        ("a", 2, 5000),
        ("a", 3, 2000),  # 3000 us late
        ("a", 4, 6000),
        ("a", 5, 7000),
    ]
    df = spark.createDataFrame(
        rows, "key string, seq long, us long"
    ).select("key", "seq", F.timestamp_micros("us").alias("ts"))
    out = disorder_audit(
        df, key_col="key", ts_col="ts", seq_col="seq", late_threshold_us=2500
    ).collect()
    r = out[0]
    assert r["n_events"] == 5
    assert r["n_out_of_order"] == 1
    assert r["max_late_us"] == 3000
    # p95 rank = ceil(0.95*5) = 5 -> the largest lateness
    assert r["p95_late_us"] == 3000
    assert r["dropped_ppm"] == 200000  # 1 of 5 beyond 2500us


def test_disorder_audit_in_order_stream_is_clean(spark):
    df = spark.createDataFrame(
        [("a", i, i * 1000) for i in range(1, 11)], "key string, seq long, us long"
    ).select("key", "seq", F.timestamp_micros("us").alias("ts"))
    r = disorder_audit(df, "key", "ts", "seq").collect()[0]
    assert r["n_out_of_order"] == 0 and r["max_late_us"] == 0 and r["dropped_ppm"] == 0


# --------------------------------------------------------- encoding profile


def test_encoding_profile_runs_and_advice(spark):
    # col 'c': 100 rows of one value -> 1 run; col 'u': all distinct
    df = spark.createDataFrame(
        [(i, "const", f"u{i}") for i in range(100)], "ord long, c string, u string"
    )
    out = {r["col_name"]: r for r in encoding_profile(df, ["c", "u"], "ord").collect()}
    assert out["c"]["n_runs"] == 1 and out["c"]["rle_friendly"] and out["c"]["dict_friendly"]
    assert out["u"]["n_runs"] == 100 and not out["u"]["rle_friendly"]
    assert out["c"]["avg_run_len_x1000"] == 100_000


def test_encoding_profile_block_boundary_resets_runs(spark):
    # same value throughout, but 2 storage blocks -> 2 runs
    df = spark.createDataFrame(
        [(i, "x") for i in range(2000)], "ord long, c string"
    )
    r = encoding_profile(df, ["c"], "ord", rows_per_block=1000).collect()[0]
    assert r["n_runs"] == 2


def test_encoding_profile_null_runs(spark):
    df = spark.createDataFrame(
        [(0, None), (1, None), (2, "a"), (3, None)], "ord long, c string"
    )
    r = encoding_profile(df, ["c"], "ord").collect()[0]
    # runs: [null,null], [a], [null] -> 3
    assert r["n_runs"] == 3


# -------------------------------------------------------------------- CUPED


def test_cuped_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    rows = []
    for u in range(60):
        base = float(rng.uniform(1, 50))
        for d in range(1, 11):
            pre = d <= 5
            rows.append(
                (u, f"2024-01-{d:02d} 12:00:00", base + float(rng.uniform(0, 5)))
            )
    df = spark.createDataFrame(rows, "user_id long, ts_s string, value double").select(
        "user_id", F.to_timestamp("ts_s").alias("ts"), "value"
    )
    out = cuped_adjust(
        df,
        split_expr="ts >= timestamp'2024-01-06 00:00:00'",
        salt="t0",
    ).collect()
    assert len(out) == 2
    # numpy reference on the same per-user micro sums
    import pandas as pd

    pdf = df.toPandas()
    pdf["micro"] = np.floor(pdf["value"] * 1_000_000).astype("int64")
    pdf["post"] = pdf["ts"] >= pd.Timestamp("2024-01-06")
    per = pdf.groupby("user_id").apply(
        lambda g: pd.Series(
            {
                "x": g.loc[~g["post"], "micro"].sum(),
                "y": g.loc[g["post"], "micro"].sum(),
            }
        ),
        include_groups=False,
    ).reset_index()
    import hashlib

    def arm(u):
        return int(hashlib.md5(f"t0|{u}".encode()).hexdigest()[:8], 16) % 2

    per["arm"] = per["user_id"].map(arm)
    x, y = per["x"].to_numpy(float), per["y"].to_numpy(float)
    n = len(per)
    theta = (n * (x * y).sum() - x.sum() * y.sum()) / (n * (x * x).sum() - x.sum() ** 2)
    gx = x.sum() / n
    for r in out:
        g = per[per["arm"] == r["arm"]]
        mean_y = g["y"].sum() / len(g)
        adj = mean_y - theta * (g["x"].sum() / len(g) - gx)
        assert r["mean_y_micro"] == pytest.approx(mean_y, rel=1e-12)
        assert r["mean_y_adj_micro"] == pytest.approx(adj, rel=1e-9)
    # variance reduction direction: adjusted means pull toward each other
    # when covariate imbalance exists (weak sanity, not an equality)
    assert all(abs(r["mean_y_adj_micro"]) > 0 for r in out)


def test_streaming_count_min_equals_batch(spark, tmp_path):
    import os

    src = str(tmp_path / "src")
    state = str(tmp_path / "cm_state")
    ck = str(tmp_path / "ck")
    df1 = spark.createDataFrame([(f"k{i % 5}",) for i in range(100)], "k string")
    df1.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("k string").parquet(src)
    q = sketches.streaming_count_min(
        stream, "k", state, depth=3, width=32, checkpoint_dir=ck
    )
    q.awaitTermination(60)
    # second wave of data -> incremental fold, corpus never re-sketched
    df2 = spark.createDataFrame([(f"k{i % 3}",) for i in range(50)], "k string")
    df2.coalesce(1).write.mode("append").parquet(src)
    q2 = sketches.streaming_count_min(
        spark.readStream.schema("k string").parquet(src),
        "k", state, depth=3, width=32, checkpoint_dir=ck,
    )
    q2.awaitTermination(60)
    streamed = {
        (r["depth"], r["bucket"]): r["c"]
        for r in spark.read.parquet(state).collect()
    }
    whole = sketches.count_min_table(
        spark.read.parquet(src), "k", depth=3, width=32
    )
    batch = {(r["depth"], r["bucket"]): r["c"] for r in whole.collect()}
    assert streamed == batch  # linearity across batch boundaries, exact


def test_realtime_rollup_frontier_inside_bucket_never_double_counts(spark):
    from samza_spark.pipeline.matview import agg_state, realtime_rollup

    rows = [(b, "k", v) for b, v in [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5)]]
    raw = spark.createDataFrame(rows, "bucket long, k string, v long")
    keys = ["bucket", "k"]
    specs = {"n": ("count", "v"), "s": ("sum", "v")}
    # materialize ONLY complete buckets below the frontier (bucket < 1);
    # the frontier bucket itself must come wholly from raw
    mat = agg_state(raw.filter("bucket < 1"), keys, specs)
    out = realtime_rollup(raw, mat, keys, specs, "bucket", 1)
    got = {(r["bucket"], r["k"]): (r["n"], r["s"]) for r in out.collect()}
    assert got == {(0, "k"): (2, 3), (1, "k"): (2, 7), (2, "k"): (1, 5)}
    # from-scratch equivalence
    whole = agg_state(raw, keys, specs)
    ref = {(r["bucket"], r["k"]): (r["n"], r["s"]) for r in whole.collect()}
    assert got == ref


def test_count_min_inner_product_bounds_join_size(spark):
    a = spark.createDataFrame([(f"k{i % 10}",) for i in range(200)], "k string")
    b = spark.createDataFrame([(f"k{i % 4}",) for i in range(80)], "k string")
    sk_a = sketches.count_min_table(a, "k", depth=4, width=64, salt="jt")
    sk_b = sketches.count_min_table(b, "k", depth=4, width=64, salt="jt")
    est = sketches.count_min_inner_product(sk_a, sk_b).collect()[0][
        "join_size_estimate"
    ]
    true_size = a.join(b, "k").count()
    assert est >= true_size
    # w=64 on ~10 keys: collisions rare, estimate should be tight
    assert est <= true_size * 2


def test_kmv_exact_below_k_and_mergeable(spark):
    df = spark.createDataFrame(
        [(f"u{i % 40}", i) for i in range(500)], "u string, i long"
    )
    # 40 distinct < k=64 -> exact
    est = sketches.kmv_estimate(
        sketches.kmv_table(df, "u", k=64), k=64
    ).collect()[0]["distinct_estimate"]
    assert est == 40
    # mergeability: min-k of halves' sketches == min-k of the whole
    k = 16
    whole = sketches.kmv_table(df, "u", k=k)
    h1 = sketches.kmv_table(df.filter("i % 2 = 0"), "u", k=k)
    h2 = sketches.kmv_table(df.filter("i % 2 = 1"), "u", k=k)
    from pyspark.sql import Window, functions as FF

    merged = (
        h1.select("h")
        .unionByName(h2.select("h"))
        .distinct()
        .withColumn("r", FF.row_number().over(Window.partitionBy(FF.lit(1)).orderBy("h")))
        .filter(FF.col("r") <= k)
    )
    assert {r["h"] for r in merged.collect()} == {r["h"] for r in whole.collect()}


def test_kmv_estimate_above_k_is_reasonable(spark):
    df = spark.createDataFrame([(f"u{i}",) for i in range(2000)], "u string")
    est = sketches.kmv_estimate(
        sketches.kmv_table(df, "u", k=64), k=64
    ).collect()[0]["distinct_estimate"]
    # 1/sqrt(64) = 12.5% expected error; allow 3 sigma
    assert abs(est - 2000) <= 0.4 * 2000


def test_zone_map_stats_sorted_vs_shuffled(spark):
    from samza_spark.pipeline.quality import zone_map_stats

    # sorted layout: value == file order -> tight zones, probe skips most
    sorted_df = spark.createDataFrame(
        [(i, i) for i in range(10_000)], "ord long, v long"
    )
    r = zone_map_stats(sorted_df, "v", "ord", probe_lo=0, probe_hi=999).collect()[0]
    assert r["n_blocks"] == 10
    assert r["n_skippable"] == 9  # only block 0 intersects [0, 999]
    assert r["skip_ppm"] == 900000
    assert r["avg_span_share_ppm"] <= 150000  # ~10% span share

    # shuffled layout: every block spans the whole range -> zero skipping
    shuf = spark.createDataFrame(
        [(i, (i * 7919) % 10_000) for i in range(10_000)], "ord long, v long"
    )
    r2 = zone_map_stats(shuf, "v", "ord", probe_lo=0, probe_hi=999).collect()[0]
    assert r2["n_skippable"] == 0
    assert r2["avg_span_share_ppm"] >= 900000


def test_lift_chart_perfect_ranker_captures_all_positives_early(spark):
    from samza_spark.pipeline.stats import lift_chart

    # 100 units; the 20 with the highest score are exactly the positives
    rows = [(u, float(100 - u), 1 if u < 20 else 0) for u in range(100)]
    df = spark.createDataFrame(rows, "user_id long, value double, pos int")
    out = lift_chart(
        df,
        key_col="user_id",
        score_col="sum(cast(floor(value * 1000000) as long))",
        positive_expr="pos = 1",
        n_bins=5,
    ).collect()
    assert [r["bin"] for r in out] == [1, 2, 3, 4, 5]
    assert out[0]["n"] == 20 and out[0]["n_pos"] == 20
    assert out[0]["rate_ppm"] == 1_000_000
    assert out[0]["cum_gain_ppm"] == 1_000_000  # top quintile captures all
    assert all(r["n_pos"] == 0 for r in out[1:])
