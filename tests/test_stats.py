"""Exact distributed OLS / Zipf fit and the deterministic exact-k
sampler."""

import math

from pyspark.sql import functions as F

from samza_spark.catalog import load_table
from samza_spark.pipeline import sampling, stats


def test_linear_fit_exact_line(spark):
    # y = 3x + 7 exactly: slope/intercept must come out exact
    df = spark.createDataFrame(
        [(x, 3 * x + 7) for x in range(0, 50, 5)], "x long, y long"
    )
    r = stats.linear_fit(df, "x", "y").collect()[0]
    assert r["n"] == 10
    assert r["slope"] == 3.0
    assert r["intercept"] == 7.0


def test_linear_fit_matches_closed_form(spark):
    pts = [(1, 10), (2, 8), (3, 9), (4, 4), (5, 3), (6, 1)]
    df = spark.createDataFrame(pts, "x long, y long")
    r = stats.linear_fit(df, "x", "y").collect()[0]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    assert r["slope"] == (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert r["intercept"] == (sy * sxx - sx * sxy) / (n * sxx - sx * sx)


def test_term_rank_table_ordering(spark):
    df = spark.createDataFrame(
        [(1, "aa aa aa bb bb cc")], "doc_id long, text string"
    )
    rows = {
        r["term"]: (r["cnt"], r["rank"])
        for r in stats.term_rank_table(df).collect()
    }
    assert rows == {"aa": (3, 1), "bb": (2, 2), "cc": (1, 3)}


def test_zipf_fit_recovers_synthetic_slope(spark):
    # freq(rank) = round(1000 * rank^-1): slope must land near -1
    docs = []
    did = 0
    for rank in range(1, 30):
        freq = max(round(1000 / rank), 1)
        docs.append((did, " ".join([f"t{rank:03d}"] * freq)))
        did += 1
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = stats.zipf_fit(df).collect()[0]
    assert r["n"] == 29
    assert abs(r["slope"] - (-1.0)) < 0.02
    # intercept in micro-nats: exp(intercept/1e6) ~ top frequency
    assert abs(math.exp(r["intercept"] / 1e6) - 1000) < 60


def test_uniform_sample_exact_k(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    total = docs.count()
    s = sampling.uniform_sample_exact_k(docs, 17)
    assert s.count() == 17
    assert s.columns == docs.columns
    # deterministic across invocations
    a = sorted(r["doc_id"] for r in s.collect())
    b = sorted(
        r["doc_id"]
        for r in sampling.uniform_sample_exact_k(docs, 17).collect()
    )
    assert a == b
    # a different salt draws a different sample (overwhelmingly likely)
    c = sorted(
        r["doc_id"]
        for r in sampling.uniform_sample_exact_k(
            docs, 17, salt="other"
        ).collect()
    )
    assert a != c
    # k >= n degenerates to the full table
    assert sampling.uniform_sample_exact_k(docs, total + 5).count() == total


def test_uniform_sample_plan_is_topk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        sampling.uniform_sample_exact_k(docs, 17)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_uniform_sample_is_prefix_stable(spark, sf_dir):
    """Growing k only ADDS rows (hash order is a fixed permutation) —
    the property that makes samples reusable as nested subsets."""
    docs = load_table(spark, sf_dir, "documents")
    small = {
        r["doc_id"]
        for r in sampling.uniform_sample_exact_k(docs, 10).collect()
    }
    big = {
        r["doc_id"]
        for r in sampling.uniform_sample_exact_k(docs, 40).collect()
    }
    assert small <= big


# ---------------------------------------------------------------------------
# partitioned-table sink: layout, pruning, dynamic overwrite
# ---------------------------------------------------------------------------


def test_partitioned_sink_layout_and_pruning(spark, sf_dir, tmp_path):
    import os

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "by_lang")
    sampling.write_partitioned_table(docs, out, ["lang"])
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    dirs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert dirs == {f"lang={l}" for l in langs}
    # one file per partition directory (the anti-small-files shuffle)
    for d in dirs:
        files = [
            f
            for f in os.listdir(os.path.join(out, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    pruned = back.where(F.col("lang") == "en")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # directory-level pruning: the predicate lands in PartitionFilters,
    # NOT in PushedFilters/data filters
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters")[1].split("]")[0]
    assert pruned.count() == docs.where("lang = 'en'").count()


def test_partitioned_sink_dynamic_overwrite(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "dyn")
    sampling.write_partitioned_table(docs, out, ["lang"])
    before = spark.read.parquet(out).count()
    # rewrite ONLY the 'en' partition with a 1-row replacement
    one = docs.where("lang = 'en'").limit(1)
    sampling.write_partitioned_table(
        one, out, ["lang"], mode="overwrite", dynamic=True
    )
    after = spark.read.parquet(out)
    n_en_before = docs.where("lang = 'en'").count()
    assert after.where("lang = 'en'").count() == 1
    # every other partition untouched
    assert after.count() == before - n_en_before + 1


# ---------------------------------------------------------------------------
# group_zscore_outliers
# ---------------------------------------------------------------------------


def test_group_zscore_matches_python(spark):
    import math

    from samza_spark.pipeline.stats import group_zscore_outliers

    rows = [(i, "a", 10) for i in range(8)] + [(100, "a", 1000)] + [
        (200, "b", 5),
        (201, "b", 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n long")
    out = {
        r["doc_id"]: r
        for r in group_zscore_outliers(
            df, "n", group_col="source", id_col="doc_id"
        ).collect()
    }
    vals = [10] * 8 + [1000]
    n = len(vals)
    mean = sum(vals) / n
    var = (n * sum(v * v for v in vals) - sum(vals) ** 2) / (n * n)
    std = math.sqrt(var)
    assert out[100]["is_outlier"] is True
    assert abs(out[100]["z"] - (1000 - mean) / std) < 1e-12
    assert all(not out[i]["is_outlier"] for i in range(8))
    # zero-variance group: z NULL, never flagged
    assert out[200]["z"] is None and out[200]["is_outlier"] is False


def test_group_zscore_single_row_group(spark):
    from samza_spark.pipeline.stats import group_zscore_outliers

    df = spark.createDataFrame([(1, "solo", 42)], "doc_id long, source string, n long")
    r = group_zscore_outliers(df, "n", group_col="source").collect()[0]
    assert r["z"] is None and r["is_outlier"] is False
