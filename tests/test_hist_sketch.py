"""Mergeable integer-histogram quantile sketch (pipeline.sketches):
linearity (merge == whole-build), error bound, and the streaming fold
== batch invariant across batch boundaries."""

from pyspark.sql import functions as F

from samza_spark.pipeline.sketches import (
    hist_merge,
    hist_quantiles,
    hist_table,
    streaming_histogram,
)

BIN = 10_000  # micro-units


def _cells(df):
    return {(r["bin"]): r["c"] for r in df.collect()}


def test_merge_linearity_exact(spark):
    a = spark.range(0, 500).select((F.col("id") * 137).alias("v"))
    b = spark.range(500, 1000).select((F.col("id") * 137).alias("v"))
    whole = hist_table(a.unionByName(b), "v", BIN)
    merged = hist_merge(hist_table(a, "v", BIN), hist_table(b, "v", BIN))
    assert _cells(whole) == _cells(merged)


def test_quantile_error_bounded_by_bin_width(spark):
    # uniform 0..99999 micro-units in bins of 10k: true p50 = 50000
    df = spark.range(100_000).select(F.col("id").alias("v"))
    h = hist_table(df, "v", BIN)
    [r] = hist_quantiles(h, [500_000], BIN).collect()
    assert abs(r["value_upper"] - 50_000) <= BIN
    [r99] = hist_quantiles(h, [990_000], BIN).collect()
    assert abs(r99["value_upper"] - 99_000) <= BIN


def test_negative_values_truncate_consistently(spark):
    df = spark.range(-50, 50).select((F.col("id") * 1000).alias("v"))
    h = hist_table(df, "v", BIN)
    # div truncates toward zero: values in (-10000, 10000) share bin 0
    cells = _cells(h)
    assert cells[0] == 19  # -9000..9000 step 1000, excluding +/-10000 edges... id -9..9
    assert sum(cells.values()) == 100


def test_streaming_fold_equals_batch(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    a = spark.range(0, 300).select((F.col("id") * 999).alias("v"))
    b = spark.range(300, 700).select((F.col("id") * 999).alias("v"))
    a.write.parquet(str(src / "f1"))
    state = str(tmp_path / "state")

    q = streaming_histogram(
        spark.readStream.schema("v long").parquet(f"{src}/*"),
        "v",
        state,
        BIN,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    b.write.parquet(str(src / "f2"))  # second wave, new trigger run
    q2 = streaming_histogram(
        spark.readStream.schema("v long").parquet(f"{src}/*"),
        "v",
        state,
        BIN,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination()

    streamed = _cells(spark.read.parquet(state))
    batch = _cells(hist_table(a.unionByName(b), "v", BIN))
    assert streamed == batch


def test_weighted_histogram_equals_repeated_rows(spark):
    # weight w == w repetitions of the row: identical cells, and the
    # weighted quantile is the token-weighted percentile
    w = spark.createDataFrame(
        [(5_000, 3), (25_000, 1), (95_000, 6)], "v long, w int"
    )
    rep = spark.createDataFrame(
        [(5_000,)] * 3 + [(25_000,)] * 1 + [(95_000,)] * 6, "v long"
    )
    hw = hist_table(w, "v", BIN, weight_expr="w")
    hr = hist_table(rep, "v", BIN)
    assert _cells(hw) == _cells(hr)
    [p50] = hist_quantiles(hw, [500_000], BIN).collect()
    assert p50["value_upper"] == 100_000  # 6/10 of mass sits in the top bin


def test_hist_ks_identity_and_disjoint(spark):
    from samza_spark.pipeline.sketches import hist_ks

    a = hist_table(spark.range(1000).selectExpr("id * 137 as v"), "v", BIN)
    # identical distributions -> KS 0
    [r] = hist_ks(a, a).collect()
    assert r["ks_ppm"] == 0 and r["d_num"] == 0
    # disjoint supports -> KS = 1 (1e6 ppm)
    b = hist_table(
        spark.range(1000).selectExpr("id * 137 + 10000000 as v"), "v", BIN
    )
    [r] = hist_ks(a, b).collect()
    assert r["ks_ppm"] == 1_000_000
