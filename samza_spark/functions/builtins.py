"""Built-in scalar functions shipped with the reference's SQL layer.

Reference UDFs (/root/reference samza-sql/src/main/java/org/apache/samza/
sql/fn/*.java, 40-111 LoC each) and their Spark expressions:

* ``BuildOutputRecord(k1, v1, ...)``  -> ``named_struct`` (BuildOutputRecordUdf)
* ``ConvertToString(x)``              -> ``cast(x as string)``
* ``Flatten(arr)``                    -> ``explode`` (handled as an operator,
  ProjectTranslator.java:147-174; exposed here as the identity passthrough
  Samza uses for non-array inputs)
* ``GetNestedField(row, 'a.b')`` / ``GetSqlField`` -> struct path access
* ``RegexMatch(pattern, str)``        -> ``rlike``

Everything in SamzaSqlOperatorTable (samza-sql/.../planner/
SamzaSqlOperatorTable.java:45-146) is a Calcite-standard operator that Spark
SQL already provides natively (SURVEY.md §2.4) — only these few named UDFs
need registration. All are implemented as *SQL expression strings* via
``expr``, so they stay inside Catalyst/codegen — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession, functions as F


def build_output_record(*pairs: Column | str) -> Column:
    """BuildOutputRecord: construct a nested record from k/v pairs."""
    return F.named_struct(*[F.lit(p) if isinstance(p, str) else p for p in pairs])


def convert_to_string(col: Column | str) -> Column:
    return F.col(col).cast("string") if isinstance(col, str) else col.cast("string")


def get_sql_field(col: Column | str, path: str) -> Column:
    """GetSqlField / GetNestedField: dotted-path access into nested rows
    (samza-sql/.../fn/GetSqlFieldUdf.java)."""
    c = F.col(col) if isinstance(col, str) else col
    for part in path.split("."):
        c = c.getField(part)
    return c


def regex_match(pattern: str, col: Column | str) -> Column:
    """RegexMatch(regex, str) — note Samza's argument order."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(pattern)


def flatten(col: Column | str, alias: str = "flattened") -> Column:
    """Flatten an array column to rows; use inside select (explode)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.explode(c).alias(alias)


# SQL-callable registrations: pure Catalyst expressions (no Python UDF).
_SQL_BUILTINS = {
    # name -> (expression template taking argument SQL strings)
    "ConvertToString": lambda x: f"cast({x} as string)",
    "RegexMatch": lambda pattern, s: f"({s} rlike {pattern})",
    "GetSqlField": None,  # needs path literal; expanded in sql/runner rewrite
}

BUILTIN_UDFS = sorted(
    ["BuildOutputRecord", "ConvertToString", "Flatten", "GetNestedField", "GetSqlField", "RegexMatch"]
)


def register_builtins(spark: SparkSession) -> None:
    """Make the reference UDF names callable from spark.sql.

    GetSqlField/GetNestedField/Flatten/BuildOutputRecord are rewritten to
    native expressions by the SQL runner (samza_spark.sql.runner) before
    execution; ConvertToString and RegexMatch are registered as SQL UDFs
    (CREATE TEMPORARY FUNCTION ... RETURN <expr>), so a direct
    ``spark.sql("... RegexMatch(...)")`` that bypasses the runner's rewrite
    still runs inside Catalyst/codegen — no BatchEvalPython in any path.
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ConvertToString(x STRING) "
        "RETURNS STRING RETURN x"  # implicit cast to the declared STRING param
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION RegexMatch(pattern STRING, s STRING) "
        "RETURNS BOOLEAN RETURN s RLIKE pattern"  # Samza's argument order
    )
