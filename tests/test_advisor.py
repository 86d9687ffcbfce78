"""Plan scale advisor (samza_spark.advisor.plan_audit)."""

from pyspark.sql import functions as F

from samza_spark.advisor import plan_audit


def _codes(findings):
    return {f["code"] for f in findings}


def test_clean_plan_has_no_findings(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter("o_totalprice > 100")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    assert plan_audit(df) == []


def test_cartesian_flagged(spark):
    a, b = spark.range(10), spark.range(10)
    findings = plan_audit(a.crossJoin(b))
    # a small cross plans as a broadcast nested-loop Cross: flagged, but
    # warn-severity (the one-row scalar-attachment idiom is the same shape)
    assert "cartesian-product" in _codes(findings)


def test_rowwise_python_flagged(spark):
    from pyspark.sql.functions import udf

    slow = udf(lambda x: x + 1, "bigint")
    assert "rowwise-python" in _codes(plan_audit(spark.range(5).select(slow("id"))))


def test_single_partition_window_flagged(spark):
    from pyspark.sql import Window

    df = spark.range(100).select(
        "id", F.row_number().over(Window.orderBy("id")).alias("rn")
    )
    assert "single-partition-exchange" in _codes(plan_audit(df))


def test_filter_pushdown_check(spark, sf_dir):
    ok = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        "o_totalprice > 100"
    )
    assert "no-filter-pushdown" not in _codes(
        plan_audit(ok, expected_filter_pushdown=True)
    )
