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


def test_single_partition_window_is_error_severity(spark):
    # r8 verdict #5: a Window FED by the SinglePartition exchange is
    # error-level (the global-window funnel), alongside the warn
    from pyspark.sql import Window

    df = spark.range(100).select(
        "id", F.row_number().over(Window.orderBy("id")).alias("rn")
    )
    sev = {f["code"]: f["severity"] for f in plan_audit(df)}
    assert sev.get("single-partition-window") == "error"
    assert sev.get("single-partition-exchange") == "warn"


def test_final_limit_single_partition_stays_warn(spark, sf_dir):
    # a SinglePartition that feeds only a final k-row stage is the
    # documented acceptable idiom — must NOT produce the error finding
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_orderstatus")
        .count()
        .coalesce(1)
    )
    codes = {f["code"] for f in plan_audit(df)}
    assert "single-partition-window" not in codes


def test_plan_graph_parser_links_exchange_through_sort(spark):
    # the detector must follow Exchange -> Sort -> Window chains, which
    # is exactly how Catalyst plans a global orderBy window
    from samza_spark.advisor import _count_single_partition_windows

    plan = (
        "== Physical Plan ==\n"
        "AdaptiveSparkPlan (4)\n"
        "+- Window (3)\n"
        "   +- Sort (2)\n"
        "      +- Exchange (1)\n"
        "\n"
        "(1) Exchange\n"
        "Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]\n"
        "(2) Sort\n"
        "Arguments: [id ASC NULLS FIRST], false, 0\n"
        "(3) Window\n"
        "Arguments: [row_number()]\n"
        "(4) AdaptiveSparkPlan\n"
    )
    assert _count_single_partition_windows(plan) == 1
    # hash-partitioned exchange under the same chain: not flagged
    assert (
        _count_single_partition_windows(
            plan.replace("SinglePartition", "hashpartitioning(k, 32)")
        )
        == 0
    )
