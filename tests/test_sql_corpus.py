"""SQL e2e golden-output corpus: table-driven queries mirroring the shapes
of the reference suite (TestSamzaSqlEndToEnd.java:56-1250 — projection,
CASE, LIKE, nested records, composite & null join keys, sub-queries,
GROUP BY count, fan-in/fan-out; SURVEY.md §5). Each case runs through
SqlApplication (compat mode where the reference would accept it) and
asserts exact rows."""

import pytest

from samza_spark.sql import SqlApplication

PAGEVIEWS = [
    # (pageKey, profileId, country, regionId)
    ("home", 1, "us", 1),
    ("blank", 2, "de", 2),
    ("search", 1, "us", 1),
    ("home", 3, None, 1),
    ("about", None, "fr", 2),
]
PROFILES = [
    # (id, name, company, addr_city, addr_zip)
    (1, "alice", "acme", "sf", 94100),
    (2, "bob", "globex", "berlin", 10100),
    (3, "carol", "acme", "nyc", 10001),
]


@pytest.fixture()
def app(spark):
    a = SqlApplication(spark)
    a.add_stream(
        "pageviews",
        spark.createDataFrame(
            PAGEVIEWS, "pageKey string, profileId int, country string, regionId int"
        ),
    )
    a.add_table(
        "profiles",
        spark.createDataFrame(
            PROFILES, "id int, name string, company string, addr_city string, addr_zip int"
        ),
    )
    return a


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_projection_with_filter(app):
    [df] = app.run(
        "SELECT pageKey, profileId FROM pageviews WHERE pageKey <> 'blank'"
    )
    assert rows(df) == [("about", None), ("home", 1), ("home", 3), ("search", 1)]


def test_case_and_like(app):
    [df] = app.run(
        "SELECT pageKey, CASE WHEN pageKey LIKE 'h%' THEN 'hot' ELSE 'cold' END AS cls "
        "FROM pageviews WHERE profileId IS NOT NULL"
    )
    assert rows(df) == [
        ("blank", "cold"),
        ("home", "hot"),
        ("home", "hot"),
        ("search", "cold"),
    ]


def test_stream_table_inner_join(app):
    [df] = app.run(
        "SELECT p.pageKey, pr.name FROM pageviews p "
        "JOIN profiles pr ON p.profileId = pr.id"
    )
    assert rows(df) == [("blank", "bob"), ("home", "alice"), ("home", "carol"), ("search", "alice")]


def test_left_join_null_misses(app):
    """Null-key rows miss (SQL null semantics) and appear with null name."""
    [df] = app.run(
        "SELECT p.pageKey, pr.name FROM pageviews p "
        "LEFT JOIN profiles pr ON p.profileId = pr.id WHERE p.pageKey = 'about'"
    )
    assert rows(df) == [("about", None)]


def test_composite_join_key(app, spark):
    """Composite (AND-only) equi-key join — JoinTranslator compound-key
    caveat (JoinTranslator.java:69-76)."""
    app.add_table(
        "geo",
        spark.createDataFrame(
            [("us", 1, "west"), ("de", 2, "eu")], "country string, regionId int, zone string"
        ),
    )
    [df] = app.run(
        "SELECT p.pageKey, g.zone FROM pageviews p "
        "JOIN geo g ON p.country = g.country AND p.regionId = g.regionId"
    )
    assert rows(df) == [("blank", "eu"), ("home", "west"), ("search", "west")]


def test_subquery_in_from(app):
    """Uncorrelated sub-query in FROM (TestSamzaSqlEndToEnd.java:835,1143)."""
    [df] = app.run(
        "SELECT pageKey, n FROM (SELECT pageKey, count(*) AS n FROM pageviews "
        "GROUP BY pageKey) WHERE n > 1"
    )
    assert rows(df) == [("home", 2)]


def test_groupby_count_compat(spark):
    """GROUP BY + COUNT — the only aggregate the reference accepts
    (LogicalAggregateTranslator.java:99-108); run in compat mode."""
    app = SqlApplication(spark, compat_mode=True)
    app.add_stream(
        "pv",
        spark.createDataFrame(PAGEVIEWS, "pageKey string, profileId int, country string, regionId int"),
    )
    [df] = app.run("SELECT pageKey, count(*) AS cnt FROM pv GROUP BY pageKey")
    assert rows(df) == [("about", 1), ("blank", 1), ("home", 2), ("search", 1)]


def test_nested_record_build_and_access(app):
    """BuildOutputRecord + GetSqlField round trip over nested structs."""
    [df] = app.run(
        "SELECT name, GetSqlField(rec, 'city') AS city FROM "
        "(SELECT name, BuildOutputRecord('city', addr_city, 'zip', addr_zip) AS rec "
        "FROM profiles)"
    )
    assert rows(df) == [("alice", "sf"), ("bob", "berlin"), ("carol", "nyc")]


def test_fan_out_multi_statement(app, spark):
    """One source feeding two sinks in one job (fan-out,
    TestSamzaSqlEndToEnd.java:186-287)."""
    from samza_spark.sources import MemorySink

    app.add_sink("hot", MemorySink("corpus_hot"))
    app.add_sink("all_pages", MemorySink("corpus_all"))
    app.run(
        "INSERT INTO hot SELECT pageKey FROM pageviews WHERE pageKey = 'home';"
        "INSERT INTO all_pages SELECT pageKey FROM pageviews"
    )
    assert len(spark.sql("SELECT * FROM corpus_hot").collect()) == 2
    assert len(spark.sql("SELECT * FROM corpus_all").collect()) == 5


def test_fan_in_union_all(app):
    """Fan-in: two filtered scans of the same stream merged (the reference
    models this as two INSERTs into one sink; relationally it's UNION ALL,
    which compat mode forbids only for UNION DISTINCT)."""
    [df] = app.run(
        "SELECT pageKey FROM pageviews WHERE pageKey = 'home' "
        "UNION ALL SELECT pageKey FROM pageviews WHERE pageKey = 'search'"
    )
    assert rows(df) == [("home",), ("home",), ("search",)]


def test_flatten_array_projection(spark):
    """flatten() -> explode (ProjectTranslator.java:147-174) — compat mode
    only; extension mode keeps Spark's native flatten(array<array<T>>)."""
    a = SqlApplication(spark, compat_mode=True)
    a.add_stream(
        "docs",
        spark.createDataFrame([(1, ["a", "b"]), (2, ["c"])], "id int, tags array<string>"),
    )
    [df] = a.run("SELECT id, flatten(tags) AS tag FROM docs")
    assert rows(df) == [(1, "a"), (1, "b"), (2, "c")]


def test_native_flatten_untouched_in_extension_mode(app, spark):
    """Permissive mode must NOT rewrite Spark's native flatten — a valid
    flatten(array<array<T>>) call keeps its concat-arrays semantics."""
    app.add_stream(
        "nested",
        spark.createDataFrame(
            [(1, [["a", "b"], ["c"]])], "id int, tags array<array<string>>"
        ),
    )
    [df] = app.run("SELECT id, flatten(tags) AS flat FROM nested")
    assert rows(df) == [(1, ["a", "b", "c"])]


def test_right_outer_join(app):
    """RIGHT OUTER stream-table join (JoinTranslator accepts
    INNER/LEFT/RIGHT, JoinTranslator.java:198-213): unmatched table rows
    surface with null stream side."""
    [df] = app.run(
        "SELECT p.pageKey, pr.name FROM pageviews p "
        "RIGHT JOIN profiles pr ON p.profileId = pr.id "
        "WHERE p.pageKey IS NULL OR p.pageKey = 'blank'"
    )
    assert rows(df) == [("blank", "bob")]  # alice+carol matched elsewhere


def test_join_null_keys_never_match(app, spark):
    """SQL null-key semantics (TestSamzaSqlEndToEnd null-key join shapes):
    a null profileId matches nothing even against a null table id."""
    app.add_table(
        "profiles_with_null",
        spark.createDataFrame(
            [(None, "ghost"), (1, "alice")], "id int, name string"
        ),
    )
    [df] = app.run(
        "SELECT p.pageKey, pr.name FROM pageviews p "
        "JOIN profiles_with_null pr ON p.profileId = pr.id"
    )
    assert rows(df) == [("home", "alice"), ("search", "alice")]


def test_udf_in_where_clause(app):
    """Reference UDFs are usable in predicates, not only projections
    (RegexMatch shapes in TestSamzaSqlEndToEnd)."""
    [df] = app.run(
        "SELECT pageKey FROM pageviews WHERE RegexMatch('^h.*', pageKey)"
    )
    assert rows(df) == [("home",), ("home",)]


def test_not_like_and_nested_case(app):
    [df] = app.run(
        "SELECT pageKey, CASE WHEN country IS NULL THEN 'unknown' "
        "WHEN country LIKE 'u%' THEN 'amer' ELSE 'other' END AS region "
        "FROM pageviews WHERE pageKey NOT LIKE 'b%'"
    )
    assert rows(df) == [
        ("about", "other"),
        ("home", "amer"),
        ("home", "unknown"),
        ("search", "amer"),
    ]


def test_multiway_stream_two_tables(app, spark):
    """Stream joined against TWO tables in one statement (multi-join
    fan-out of the stream-table shape)."""
    app.add_table(
        "companies",
        spark.createDataFrame(
            [("acme", "tech"), ("globex", "energy")], "company string, sector string"
        ),
    )
    [df] = app.run(
        "SELECT p.pageKey, pr.name, c.sector FROM pageviews p "
        "JOIN profiles pr ON p.profileId = pr.id "
        "JOIN companies c ON pr.company = c.company"
    )
    assert rows(df) == [
        ("blank", "bob", "energy"),
        ("home", "alice", "tech"),
        ("home", "carol", "tech"),
        ("search", "alice", "tech"),
    ]


def test_insert_select_projection_reorder(app, spark):
    """INSERT INTO with reordered/renamed projection — the sink sees the
    SELECT's schema (QueryTranslator sink mapping)."""
    from samza_spark.sources import MemorySink

    app.add_sink("out_reordered", MemorySink("corpus_reord"))
    app.run(
        "INSERT INTO out_reordered SELECT profileId AS pid, upper(pageKey) AS pk "
        "FROM pageviews WHERE profileId = 1"
    )
    got = sorted(
        (r.pid, r.pk) for r in spark.sql("SELECT * FROM corpus_reord").collect()
    )
    assert got == [(1, "HOME"), (1, "SEARCH")]


def test_scalar_functions_in_statement_form(app):
    """String/math scalars inside the statement form (SamzaSqlOperatorTable
    families end-to-end through the runner, not just DataFrame probes)."""
    [df] = app.run(
        "SELECT upper(pageKey) AS pk, char_length(pageKey) AS n, "
        "coalesce(country, 'xx') AS c, mod(regionId, 2) AS m "
        "FROM pageviews WHERE pageKey = 'home'"
    )
    assert rows(df) == [("HOME", 4, "us", 1), ("HOME", 4, "xx", 1)]


# ---------------------------------------------------------------------------
# round-5 corpus expansion: the remaining TestSamzaSqlEndToEnd shapes
# ---------------------------------------------------------------------------


def test_null_value_records_pass_through(app):
    """Records with null fields survive projection with nulls intact
    (TestSamzaSqlEndToEnd.java:134 testEndToEndWithNullRecords)."""
    [df] = app.run("SELECT pageKey, country, profileId FROM pageviews")
    got = {tuple(r) for r in df.collect()}
    assert ("home", None, 3) in got
    assert ("about", "fr", None) in got
    assert len(got) == 5


def test_boolean_is_true_filter(app, spark):
    """WHERE flag IS TRUE (TestSamzaSqlEndToEnd.java:313
    testEndToEndWithBooleanCheck)."""
    app.add_stream(
        "flags",
        spark.createDataFrame(
            [(1, True), (2, False), (3, None)], "id int, flag boolean"
        ),
    )
    [df] = app.run("SELECT id FROM flags WHERE flag IS TRUE")
    assert rows(df) == [(1,)]


def test_compound_boolean_check(app, spark):
    """Boolean field ANDed with a comparison — the shape the reference
    needed a Calcite workaround for (TestSamzaSqlEndToEnd.java:333-376
    testEndToEndCompoundBooleanCheck/Workaround); native Catalyst takes
    it directly."""
    app.add_stream(
        "flags",
        spark.createDataFrame(
            [(1, True), (2, True), (3, False)], "id int, flag boolean"
        ),
    )
    [df] = app.run("SELECT id FROM flags WHERE flag AND id >= 2")
    assert rows(df) == [(2,)]


def test_float_to_string_conversion(app, spark):
    """CAST(real AS VARCHAR) (TestSamzaSqlEndToEnd.java:494
    testEndToEndWithFloatToStringConversion)."""
    app.add_stream(
        "scores", spark.createDataFrame([(1, 0.5), (2, 2.25)], "id int, s double")
    )
    [df] = app.run("SELECT id, CAST(s AS STRING) AS s_str FROM scores")
    assert rows(df) == [(1, "0.5"), (2, "2.25")]


def test_complex_record_arrays_and_maps(app, spark):
    """Array/map-valued record fields projected and indexed
    (TestSamzaSqlEndToEnd.java:471 testEndToEndComplexRecord)."""
    from pyspark.sql import functions as F

    df_in = spark.createDataFrame(
        [(1, ["a", "b"], [("k1", "v1")]), (2, ["c"], [("k2", "v2")])],
        "id int, tags array<string>, kvs array<struct<k:string,v:string>>",
    ).withColumn("m", F.map_from_entries(F.expr("transform(kvs, x -> struct(x.k, x.v))")))
    app.add_stream("complexrec", df_in)
    [df] = app.run(
        "SELECT id, tags[0] AS first_tag, element_at(m, 'k1') AS v1 FROM complexrec"
    )
    assert rows(df) == [(1, "a", "v1"), (2, "c", None)]


def test_flatten_with_udf(app, spark):
    """Flatten combined with a scalar UDF on the exploded values
    (TestSamzaSqlEndToEnd.java:543 testEndToEndFlattenWithUdf)."""
    from samza_spark.functions import UdfRegistry

    reg = UdfRegistry()
    reg.register("MyShout", lambda s: s.str.upper(), "string", params=["string"])
    reg.attach(spark)
    app.add_stream(
        "multi",
        spark.createDataFrame(
            [(1, ["x", "y"]), (2, ["z"])], "id int, vals array<string>"
        ),
    )
    [df] = app.run(
        "SELECT id, MyShout(v) AS shouted FROM (SELECT id, explode(vals) AS v FROM multi)"
    )
    assert rows(df) == [(1, "X"), (1, "Y"), (2, "Z")]


def test_join_key_via_udf(app, spark):
    """Stream-table join whose key passes through a UDF
    (TestSamzaSqlEndToEnd.java:866 testEndToEndStreamTableInnerJoinWithUdf)."""
    from samza_spark.functions import UdfRegistry

    reg = UdfRegistry()
    reg.register("MyIdent", lambda i: i, "int", params=["int"])
    reg.attach(spark)
    [df] = app.run(
        "SELECT p.pageKey, pr.name FROM pageviews p "
        "JOIN profiles pr ON MyIdent(p.profileId) = pr.id"
    )
    assert rows(df) == [
        ("blank", "bob"),
        ("home", "alice"),
        ("home", "carol"),
        ("search", "alice"),
    ]


def test_join_on_nested_field(app, spark):
    """Join key read from a nested record field
    (TestSamzaSqlEndToEnd.java:898
    testEndToEndStreamTableInnerJoinWithNestedRecord)."""
    from pyspark.sql import functions as F

    nested = spark.createDataFrame(
        PAGEVIEWS, "pageKey string, profileId int, country string, regionId int"
    ).select(
        "pageKey", F.struct(F.col("profileId").alias("pid")).alias("meta")
    )
    app.add_stream("nestedpv", nested)
    [df] = app.run(
        "SELECT n.pageKey, pr.name FROM nestedpv n "
        "JOIN profiles pr ON n.meta.pid = pr.id"
    )
    assert rows(df) == [
        ("blank", "bob"),
        ("home", "alice"),
        ("home", "carol"),
        ("search", "alice"),
    ]


def test_join_with_filter(app):
    """Stream-table join combined with a residual WHERE
    (TestSamzaSqlEndToEnd.java:935
    testEndToEndStreamTableInnerJoinWithFilter)."""
    [df] = app.run(
        "SELECT p.pageKey, pr.name FROM pageviews p "
        "JOIN profiles pr ON p.profileId = pr.id WHERE pr.company = 'acme'"
    )
    assert rows(df) == [("home", "alice"), ("home", "carol"), ("search", "alice")]


def test_same_stream_as_input_and_output(app, spark):
    """A sink written by statement 1 read back by statement 2 in the same
    job (TestSamzaSqlEndToEnd.java:212
    testEndToEndMultiSqlStmtsWithSameSystemStreamAsInputAndOutput)."""
    from samza_spark.sources import MemorySink

    app.add_sink("stage", MemorySink("corpus_stage"))
    app.run("INSERT INTO stage SELECT pageKey FROM pageviews WHERE pageKey = 'home'")
    # second statement consumes the staged stream
    app.add_stream("staged", spark.sql("SELECT * FROM corpus_stage"))
    [df] = app.run("SELECT pageKey FROM staged")
    assert rows(df) == [("home",), ("home",)]
