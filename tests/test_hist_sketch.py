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


def test_hist_ks_no_overflow_at_billion_row_counts(spark):
    """r8 ADVICE fix: the *1e6 ppm scaling used to wrap int64 at only
    ~4e6 rows per side (d_num can reach nA*nB). Synthesize cell tables
    whose counts model 2e9 rows per side — far past the old wrap point —
    and check exact ppm/EMD values computed via Python bigints."""
    from samza_spark.pipeline.sketches import hist_ks

    n = 2_000_000_000  # rows per side (cell counts only — tiny table)
    a = spark.createDataFrame([(0, n // 2), (1, n // 2)], "bin bigint, c long")
    b = spark.createDataFrame([(0, n // 4), (1, 3 * n // 4)], "bin bigint, c long")
    [r] = hist_ks(a, b, bin_width=7).collect()
    # exact reference in unbounded Python ints
    gap_bin0 = abs((n // 2) * n - (n // 4) * n)
    gap_bin1 = 0  # full cumulative mass on both sides
    d_num = max(gap_bin0, gap_bin1)
    emd_num = gap_bin0 + gap_bin1
    assert r["d_num"] == d_num
    assert r["emd_num"] == emd_num
    assert r["ks_ppm"] == d_num * 1_000_000 // (n * n) == 250_000
    assert r["emd_scaled"] == emd_num * 7 // (n * n)
    assert r["ks_ppm"] > 0 and r["emd_scaled"] > 0  # the old code wrapped negative


def test_streaming_fold_corrupt_state_fails_loudly(spark, tmp_path):
    """r8 ADVICE fix: a corrupt/partial state file must FAIL the trigger
    (so it retries) rather than silently resetting accumulated state."""
    import pytest
    from samza_spark.pipeline.sketches import _read_prior_state

    state = tmp_path / "state"
    # missing path -> None (first trigger bootstrap)
    assert _read_prior_state(spark, str(state)) is None
    # corrupt parquet -> propagate, never silently discard
    state.mkdir()
    (state / "part-00000.parquet").write_bytes(b"not a parquet file")
    with pytest.raises(Exception) as ei:
        df = _read_prior_state(spark, str(state))
        if df is not None:  # spark may defer the read failure to action time
            df.collect()
    assert "PATH_NOT_FOUND" not in str(ei.value)
