"""SQL shell (CliShell/SamzaExecutor analog): command dispatch, metadata
commands, batch SELECT, streaming INSERT execution tracking, STOP/RM."""

import pytest

from samza_spark.sql.shell import ShellSession
from samza_spark.sources import FileSink, MemorySink


@pytest.fixture()
def shell(spark):
    spark.createDataFrame(
        [(1, "alice", 30), (2, "bob", 17), (3, "carol", 45)],
        "id int, name string, age int",
    ).createOrReplaceTempView("people")
    return ShellSession(spark)


def test_show_tables_and_describe(shell):
    r = shell.execute("SHOW TABLES")
    assert ("people",) in [tuple(x) for x in r.rows]
    d = shell.execute("DESCRIBE people")
    assert [tuple(x) for x in d.rows] == [
        ("id", "int", True),
        ("name", "string", True),
        ("age", "int", True),
    ]


def test_show_functions_lists_builtins(shell):
    r = shell.execute("SHOW FUNCTIONS")
    names = {row[0] for row in r.rows}
    assert {"RegexMatch", "GetSqlField", "BuildOutputRecord"} <= names


def test_batch_select_returns_rows(shell):
    r = shell.execute("SELECT name FROM people WHERE age >= 18 ORDER BY id;")
    assert [row[0] for row in r.rows] == ["alice", "carol"]
    assert r.columns == ["name"]


def test_set_and_unknown(shell):
    assert shell.execute("SET spark.sql.shuffle.partitions=7").kind == "ok"
    assert shell.spark.conf.get("spark.sql.shuffle.partitions") == "7"
    shell.execute("SET spark.sql.shuffle.partitions=4")
    assert "unknown" in shell.execute("FROBNICATE").text


def test_streaming_insert_ls_stop_rm(shell, spark, tmp_path):
    src_dir = tmp_path / "in"
    src_dir.mkdir()
    spark.createDataFrame([(1, "x")], "id int, v string").write.parquet(
        str(src_dir / "f1")
    )
    spark.readStream.schema("id int, v string").parquet(
        f"{src_dir}/*"
    ).createOrReplaceTempView("instream")
    shell.app.add_sink("out", MemorySink("shell_out", output_mode="append"))
    r = shell.execute("INSERT INTO out SELECT id, upper(v) AS v FROM instream")
    assert r.kind == "execution"
    ls = shell.execute("LS")
    assert any(row[0] == r.execution_id and row[1] == "RUNNING" for row in ls.rows)
    q = shell._executions[r.execution_id].query
    q.processAllAvailable()
    assert [tuple(x) for x in spark.sql("SELECT * FROM shell_out").collect()] == [(1, "X")]
    shell.execute(f"STOP {r.execution_id}")
    ls2 = shell.execute("LS")
    assert any(row[0] == r.execution_id and row[1] == "STOPPED" for row in ls2.rows)
    shell.execute(f"RM {r.execution_id}")
    assert shell.execute("LS").rows == []


def test_streaming_select_live_view(shell, spark, tmp_path):
    """Shell SELECT on a streaming source starts a transient memory-sink
    query the shell can poll (SamzaExecutor live-view analog)."""
    d = tmp_path / "livesel"
    d.mkdir()
    spark.createDataFrame([(1, "x"), (2, "y")], "id int, v string").write.parquet(
        str(d / "f1")
    )
    spark.readStream.schema("id int, v string").parquet(f"{d}/*").createOrReplaceTempView(
        "livestream"
    )
    r = shell.execute("SELECT id, upper(v) AS vu FROM livestream WHERE id > 1")
    assert r.kind == "execution" and "live view" in r.text
    q = shell._executions[r.execution_id].query
    q.processAllAvailable()
    rows = {tuple(x) for x in shell.view_rows(r.execution_id)}
    assert rows == {(2, "Y")}
    shell.execute(f"RM {r.execution_id}")
    assert not q.isActive


def test_multiline_statement_buffering(shell):
    # SQL buffers until ';' (CliShell behavior); meta commands run at once
    assert shell.feed("SELECT name") is None
    assert shell.pending
    assert shell.feed("FROM people WHERE age >= 18") is None
    r = shell.feed("ORDER BY id;")
    assert not shell.pending
    assert [row[0] for row in r.rows] == ["alice", "carol"]
    # one-liners with ';' execute immediately
    r2 = shell.feed("SELECT name FROM people WHERE id = 2;")
    assert [row[0] for row in r2.rows] == ["bob"]
    # meta command never buffers
    assert shell.feed("SHOW TABLES").kind == "rows"


def test_tab_completion(shell):
    # command keywords at line start
    assert shell.completions("", "S") == ["SELECT", "SET", "SHOW", "STOP"]
    assert shell.completions("", "de") == ["DESCRIBE"]
    # table names after FROM / INTO / JOIN / DESCRIBE
    assert "people" in shell.completions("SELECT * FROM ", "pe")
    assert "people" in shell.completions("DESCRIBE ", "")
    assert "people" in shell.completions("SELECT a FROM t JOIN ", "peo")
    # SHOW completes its two objects
    assert shell.completions("SHOW ", "T") == ["TABLES"]
    assert shell.completions("SHOW ", "") == ["FUNCTIONS", "TABLES"]
    # inside a SELECT body: keywords, tables, and registered functions
    body = shell.completions("SELECT name ", "FR")
    assert body == ["FROM"]
    assert "RegexMatch" in shell.completions("SELECT ", "Reg")
    assert "people" in shell.completions("SELECT ", "peop")
    # completion is buffer-aware across multi-line statements
    assert shell.feed("SELECT name") is None
    assert shell.completions("", "WHER") == ["WHERE"]
    assert "people" in shell.completions("FROM ", "")
    shell.feed("FROM people;")  # close the statement


def test_shell_merge_statement(spark):
    from samza_spark.sql.runner import SqlApplication
    from samza_spark.sql.shell import ShellSession

    app = SqlApplication(spark)
    app.add_table(
        "shtgt", spark.createDataFrame([(1, "a"), (2, "b")], "id long, k string")
    )
    app.add_table(
        "shchg",
        spark.createDataFrame([(2, "b2", "U"), (3, "c", "I")], "id long, k string, op string"),
    )
    sh = ShellSession(spark, app)
    res = sh.execute(
        "MERGE INTO shtgt USING shchg ON shtgt.id = shchg.id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    assert res.kind == "text" and "merged into 'shtgt' (3 rows)" in res.text
    got = {(r["id"], r["k"]) for r in spark.table("shtgt").collect()}
    assert got == {(1, "a"), (2, "b2"), (3, "c")}


def test_explain_shows_plan_and_advisor(spark):
    from samza_spark.sql.runner import SqlApplication
    from samza_spark.sql.shell import ShellSession

    app = SqlApplication(spark, compat_mode=False)
    app.add_stream(
        "exp_src",
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, k string"),
    )
    sh = ShellSession(spark, app)
    r = sh.execute("EXPLAIN SELECT k, count(*) AS n FROM exp_src GROUP BY k")
    assert "HashAggregate" in r.text or "Aggregate" in r.text
    assert "scale advisor" in r.text
    # a clean aggregate has no hazard findings
    assert "no known hazard shapes" in r.text
    # a cross join triggers the advisor through the same command
    app.add_stream(
        "exp_b", spark.createDataFrame([(1,)], "x long")
    )
    r2 = sh.execute("EXPLAIN SELECT * FROM exp_src CROSS JOIN exp_b")
    assert "cartesian-product" in r2.text


def test_materialized_view_create_refresh(shell, spark):
    r = shell.execute(
        "CREATE MATERIALIZED VIEW adults AS "
        "SELECT name, age FROM people WHERE age >= 18"
    )
    assert "materialized view 'adults' (2 rows)" in r.text
    # queries hit the materialization (a temp view over parquet)
    got = shell.execute("SELECT name FROM adults ORDER BY name;")
    assert [row[0] for row in got.rows] == ["alice", "carol"]
    assert shell.execute("SHOW MATERIALIZED VIEWS").rows == [("adults",)]

    # the MV is a SNAPSHOT: base-table changes are invisible until REFRESH
    spark.createDataFrame(
        [(1, "alice", 30), (2, "bob", 17), (3, "carol", 45), (4, "dave", 52)],
        "id int, name string, age int",
    ).createOrReplaceTempView("people")
    got = shell.execute("SELECT count(*) AS n FROM adults;")
    assert got.rows[0][0] == 2
    r = shell.execute("REFRESH MATERIALIZED VIEW adults")
    assert "refreshed 'adults' (3 rows)" in r.text
    got = shell.execute("SELECT name FROM adults ORDER BY name;")
    assert [row[0] for row in got.rows] == ["alice", "carol", "dave"]
    assert "unknown" in shell.execute("REFRESH MATERIALIZED VIEW nope").text


def test_explain_analyze_reports_rows_and_seconds(shell):
    r = shell.execute("EXPLAIN ANALYZE SELECT name FROM people WHERE age >= 18")
    assert "scale advisor" in r.text
    assert "analyze: 2 rows in " in r.text


def test_explain_three_way_join_prints_sketch_order_advice(spark):
    """r8: EXPLAIN on a 3-way equi-join surfaces the count-min sketch
    CBO (advisor.sql_join_advice) — per-edge cardinality estimate,
    broadcast/shuffle strategy, build side, and greedy join order."""
    from samza_spark.sql.runner import SqlApplication
    from samza_spark.sql.shell import ShellSession

    app = SqlApplication(spark, compat_mode=False)
    app.add_stream(
        "ja_fact",
        spark.range(2000).selectExpr("id AS fid", "id % 50 AS cust", "id % 7 AS cat"),
    )
    app.add_table(
        "ja_cust", spark.range(50).selectExpr("id AS cust", "concat('c', id) AS cname")
    )
    app.add_table(
        "ja_cat", spark.range(7).selectExpr("id AS cat", "concat('k', id) AS kname")
    )
    sh = ShellSession(spark, app)
    r = sh.execute(
        "EXPLAIN SELECT f.fid, c.cname, k.kname FROM ja_fact f "
        "JOIN ja_cust c ON f.cust = c.cust "
        "JOIN ja_cat k ON f.cat = k.cat"
    )
    assert "join advisor (count-min sketch CBO):" in r.text
    assert "ja_fact|ja_cust" in r.text and "ja_fact|ja_cat" in r.text
    assert "strategy=broadcast" in r.text  # both dims are tiny
    assert "#1 " in r.text and "#2 " in r.text  # greedy rank present
    # build side is always the smaller input
    assert "build_side=ja_cust" in r.text and "build_side=ja_cat" in r.text
    # statements without extractable edges stay clean (no advisor block)
    r2 = sh.execute("EXPLAIN SELECT count(*) AS n FROM ja_fact")
    assert "join advisor" not in r2.text
