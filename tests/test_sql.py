"""SQL surface: parser, compat validator, builtin rewrites, end-to-end
multi-statement runs (golden-output corpus shapes from
TestSamzaSqlEndToEnd.java — SURVEY.md §5)."""

import pytest

from samza_spark.sources import MemorySink, MemorySource
from samza_spark.sql import (
    SqlApplication,
    SqlValidationError,
    parse_statements,
    validate_compat,
)
from samza_spark.sql.runner import rewrite_builtins


def test_parse_insert_and_bare_select():
    stmts = parse_statements(
        "INSERT INTO kafka.out SELECT a FROM t; SELECT b FROM u"
    )
    assert stmts[0].sink == "kafka.out" and stmts[0].select.lower().startswith("select a")
    assert stmts[1].sink is None


def test_parse_rejects_other_statements():
    with pytest.raises(ValueError):
        parse_statements("DELETE FROM t")


def test_source_table_extraction():
    [stmt] = parse_statements(
        "INSERT INTO o SELECT * FROM pv JOIN profile ON pv.id = profile.id"
    )
    assert stmt.source_tables == ["pv", "profile"]


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT * FROM t ORDER BY a",
        "SELECT * FROM t LIMIT 5",
        "SELECT a FROM t UNION SELECT a FROM u",
        "SELECT sum(a) FROM t GROUP BY b",
        "SELECT count(*), count(b) FROM t GROUP BY c",
        "SELECT a, rank() OVER (ORDER BY b) FROM t",
        "SELECT count(DISTINCT a) FROM t GROUP BY b",
    ],
)
def test_compat_validator_rejects(bad):
    with pytest.raises(SqlValidationError):
        validate_compat(bad)


def test_compat_validator_accepts_samza_subset():
    validate_compat("SELECT a, b FROM t WHERE a <> 'x'")
    validate_compat("SELECT k, count(*) AS c FROM t GROUP BY k")


def test_plan_validator_no_false_positive_on_keyword_columns(spark):
    """Plan-based validation (analyzed logical plan, not query text): a
    column literally named `limit` or `except` must pass; the same
    constructs as OPERATORS must still be rejected."""
    spark.createDataFrame(
        [(1, 2, 3)], "`limit` int, `except` int, k int"
    ).createOrReplaceTempView("kw")
    # keyword-named columns: fine on the plan, false-positive on the text
    validate_compat("SELECT `limit`, `except` FROM kw WHERE `limit` > 0", spark=spark)
    validate_compat(
        "SELECT k, count(*) AS c FROM kw GROUP BY k", spark=spark
    )
    with pytest.raises(SqlValidationError, match="LIMIT"):
        validate_compat("SELECT k FROM kw LIMIT 5", spark=spark)
    with pytest.raises(SqlValidationError, match="ORDER BY"):
        validate_compat("SELECT k FROM kw ORDER BY k", spark=spark)
    with pytest.raises(SqlValidationError, match="sum"):
        validate_compat("SELECT k, sum(`limit`) FROM kw GROUP BY k", spark=spark)
    with pytest.raises(SqlValidationError, match="HAVING"):
        validate_compat(
            "SELECT k, count(*) AS c FROM kw GROUP BY k HAVING count(*) > 1",
            spark=spark,
        )
    with pytest.raises(SqlValidationError, match="DISTINCT"):
        validate_compat(
            "SELECT k, count(DISTINCT `limit`) FROM kw GROUP BY k", spark=spark
        )
    with pytest.raises(SqlValidationError, match="OVER"):
        validate_compat(
            "SELECT k, rank() OVER (ORDER BY `limit`) FROM kw", spark=spark
        )
    with pytest.raises(SqlValidationError, match="rollup"):
        validate_compat(
            "SELECT k, count(*) FROM kw GROUP BY ROLLUP(k)", spark=spark
        )
    # unresolvable view -> graceful textual fallback, still validates
    with pytest.raises(SqlValidationError, match="LIMIT"):
        validate_compat("SELECT x FROM no_such_view LIMIT 3", spark=spark)


def test_rewrite_builtins():
    assert (
        rewrite_builtins("SELECT GetSqlField(address, 'streetnum.number') FROM p")
        == "SELECT address.streetnum.number FROM p"
    )
    assert "explode(arr)" in rewrite_builtins("SELECT flatten(arr) FROM t")
    assert "named_struct(" in rewrite_builtins("SELECT BuildOutputRecord('k', v) FROM t")
    assert "cast(x as string)" in rewrite_builtins("SELECT ConvertToString(x) FROM t")
    assert "(txt rlike 'a.*b')" in rewrite_builtins("SELECT RegexMatch('a.*b', txt) FROM t")


def test_sql_application_end_to_end(spark):
    """Passthrough + projection shape (TestSamzaSqlEndToEnd.java:62)."""
    app = SqlApplication(spark)
    app.add_stream(
        "pageview",
        MemorySource(
            [("home", 1), ("blank", 2), ("job", 3)], "pageKey string, profileId int"
        ).read(spark),
    )
    sink = MemorySink("outview")
    app.add_sink("outview", sink)
    app.run("INSERT INTO outview SELECT pageKey, profileId FROM pageview WHERE pageKey <> 'blank'")
    rows = sink.collect(spark)
    assert sorted(r.pageKey for r in rows) == ["home", "job"]


def test_sql_stream_table_join_with_nested(spark):
    """Stream-table join + nested access (TestSamzaSqlEndToEnd.java:770-800)."""
    from pyspark.sql import Row

    app = SqlApplication(spark)
    app.add_stream(
        "pageview",
        MemorySource([("pk1", 1), ("pk2", 7)], "pageKey string, profileId int").read(spark),
    )
    profiles = spark.createDataFrame(
        [Row(id=1, name="Ann", address=Row(zip=94110, streetnum=Row(number=42)))]
    )
    app.add_table("profile", profiles)
    [df] = app.run(
        "SELECT pv.pageKey, p.name AS profileName, "
        "GetSqlField(p.address, 'streetnum.number') AS streetnum "
        "FROM pageview AS pv JOIN profile AS p ON p.id = pv.profileId"
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0].streetnum == 42


def test_compat_mode_rejects_stream_stream_join(spark):
    app = SqlApplication(spark, compat_mode=True)
    app.add_stream("s1", MemorySource([(1,)], "a int").read(spark))
    app.add_stream("s2", MemorySource([(1,)], "a int").read(spark))
    with pytest.raises(SqlValidationError, match="Stream-stream"):
        app.run("SELECT s1.a FROM s1 JOIN s2 ON s1.a = s2.a")


def test_multi_statement_fan_out(spark):
    app = SqlApplication(spark)
    app.add_stream("src", MemorySource([(1,), (2,)], "a int").read(spark))
    s1, s2 = MemorySink("out1"), MemorySink("out2")
    app.add_sink("out1", s1).add_sink("out2", s2)
    app.run("INSERT INTO out1 SELECT a FROM src WHERE a = 1; INSERT INTO out2 SELECT a FROM src")
    assert len(s1.collect(spark)) == 1 and len(s2.collect(spark)) == 2


def test_output_schema_validation(spark):
    """Sink-declared schema enforced on INSERT (SamzaSqlValidator.java:
    180-254 output-record validation)."""
    from samza_spark.sources import MemorySink

    app = SqlApplication(spark)
    app.add_stream("src9", spark.createDataFrame([(1, "x")], "id int, v string"))
    app.add_sink("good", MemorySink("osv_good"), schema="id int, v string")
    app.run("INSERT INTO good SELECT id, v FROM src9")  # fits

    app.add_sink("strict", MemorySink("osv_strict"), schema="id int, v string")
    with pytest.raises(SqlValidationError, match="missing"):
        app.run("INSERT INTO strict SELECT id FROM src9")
    with pytest.raises(SqlValidationError, match="type mismatch"):
        app.run("INSERT INTO strict SELECT cast(id as bigint) AS id, v FROM src9")


def test_compat_streaming_groupby_gets_processing_time_window(spark, tmp_path):
    """Samza SQL GROUP BY on a stream = config-fixed processing-time
    tumbling window (samza.sql.groupby.window.ms, default 5 min —
    LogicalAggregateTranslator.java:62-87)."""
    d = tmp_path / "gbw"
    d.mkdir()
    spark.createDataFrame(
        [("click",), ("click",), ("view",)], "etype string"
    ).write.parquet(str(d / "b1"))
    app = SqlApplication(spark, compat_mode=True, groupby_window_ms=60_000)
    app.add_stream(
        "ev", spark.readStream.schema("etype string").parquet(f"{d}/*")
    )
    [df] = app.run("SELECT etype, count(*) AS cnt FROM ev GROUP BY etype")
    assert df.isStreaming
    assert {"window_start", "window_end", "etype", "cnt"} <= set(df.columns)
    q = (
        df.writeStream.format("memory")
        .queryName("gbw_out")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {(r.etype, r.cnt) for r in spark.sql("SELECT * FROM gbw_out").collect()}
    assert rows == {("click", 2), ("view", 1)}
    got = spark.sql("SELECT * FROM gbw_out").collect()
    assert all((r.window_end.timestamp() - r.window_start.timestamp()) == 60 for r in got)


def test_builtin_udfs_stay_in_catalyst(spark):
    """Direct spark.sql calls to the registered builtins (bypassing the
    runner's rewrite) must run as SQL UDFs inside Catalyst — no
    BatchEvalPython / row-at-a-time Python in the plan."""
    from samza_spark.functions.builtins import register_builtins

    register_builtins(spark)
    spark.createDataFrame(
        [("axxb", 7), ("nope", 8)], "txt string, n int"
    ).createOrReplaceTempView("bu")
    df = spark.sql(
        "SELECT RegexMatch('a.*b', txt) AS m, ConvertToString(n) AS s FROM bu"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert sorted(tuple(r) for r in df.collect()) == [(False, "8"), (True, "7")]


def test_udf_overload_dispatch_from_sql(spark):
    """Polymorphic UDF names (@SamzaSqlUdfMethod, SamzaSqlUdfMethod.java:
    34-45): one name, several signatures, dispatched on arg count and
    runtime types — int vs string overloads and a vararg form, all
    callable from SQL."""
    from samza_spark.functions import UdfRegistry

    reg = UdfRegistry()
    reg.register("tagit", lambda i: f"int:{i}", "string", params=["int"])
    reg.register("tagit", lambda s: f"str:{s}", "string", params=["string"])
    reg.register(
        "tagit",
        lambda s, n: f"both:{s}*{n}",
        "string",
        params=["string", "int"],
    )
    reg.register(
        "joinall", lambda *xs: "|".join(str(x) for x in xs), "string", varargs=True
    )
    reg.attach(spark)
    spark.createDataFrame(
        [(5, "abc")], "n int, t string"
    ).createOrReplaceTempView("ov")
    row = spark.sql(
        "SELECT tagit(n) AS a, tagit(t) AS b, tagit(t, n) AS c, "
        "joinall(n, t, 'z') AS d FROM ov"
    ).first()
    assert (row.a, row.b, row.c, row.d) == (
        "int:5",
        "str:abc",
        "both:abc*5",
        "5|abc|z",
    )
    # return-type conflicts are rejected at registration
    import pytest

    with pytest.raises(ValueError):
        reg.register("tagit", lambda b: b, "boolean", params=["bool"])
    # no matching overload -> clear TypeError at execution
    with pytest.raises(Exception, match="no overload"):
        spark.sql("SELECT tagit(CAST(1.5 AS DOUBLE)) FROM ov").collect()


def test_merge_into_statement_full_cdc(spark):
    """MERGE INTO with the CDC clause set: delete on s.op='D', update
    matched, insert unmatched — semantics == pipeline.versioning.
    merge_upsert on the same batch."""
    from samza_spark.sql.runner import SqlApplication

    app = SqlApplication(spark)
    app.add_table(
        "tgt",
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, k string, v long"
        ),
    )
    app.add_table(
        "chg",
        spark.createDataFrame(
            [
                (2, "b2", 21, "U"),   # update
                (3, None, 0, "D"),    # delete
                (4, "d", 40, "I"),    # insert
                (9, None, 0, "D"),    # delete of absent key -> no-op
            ],
            "id long, k string, v long, op string",
        ),
    )
    (merged,) = app.run(
        "MERGE INTO tgt AS t USING chg AS s ON t.id = s.id "
        "WHEN MATCHED AND s.op = 'D' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = {(r["id"], r["k"], r["v"]) for r in merged.collect()}
    assert got == {(1, "a", 10), (2, "b2", 21), (4, "d", 40)}
    # the target view now reflects the merge (re-registered)
    assert {r["id"] for r in spark.table("tgt").collect()} == {1, 2, 4}


def test_merge_into_delete_only_and_validation(spark):
    from samza_spark.sql.runner import SqlApplication

    app = SqlApplication(spark)
    app.add_table(
        "t2", spark.createDataFrame([(1, "x"), (2, "y")], "id long, k string")
    )
    app.add_table(
        "c2",
        spark.createDataFrame([(1, "D"), (5, "D")], "id long, op string"),
    )
    (merged,) = app.run(
        "MERGE INTO t2 USING c2 ON t2.id = c2.id "
        "WHEN MATCHED AND c2.op = 'D' THEN DELETE"
    )
    assert {r["id"] for r in merged.collect()} == {2}

    import pytest as _pt

    with _pt.raises(ValueError, match="at least one WHEN"):
        app.run("MERGE INTO t2 USING c2 ON t2.id = c2.id")
    with _pt.raises(ValueError, match="unsupported MERGE clause"):
        app.run(
            "MERGE INTO t2 USING c2 ON t2.id = c2.id "
            "WHEN MATCHED THEN UPDATE SET k = 'z'"
        )
