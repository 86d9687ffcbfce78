"""SQL application runner: sources + statements -> running queries.

Reference lifecycle (SURVEY.md §3.1): SamzaSqlApplicationRunner ->
SamzaSqlDslConverter (parse, plan via Calcite HEP) -> QueryTranslator
(RelShuttle emitting DSL ops). Our lifecycle collapses the two IRs into
Catalyst: register every source as a temp view, rewrite the reference's
named UDFs into native expressions, and hand the SELECT to ``spark.sql`` —
Catalyst then does strictly more than the reference's three HEP rules
(QueryPlanner.java:146-163; see SURVEY.md §4.1).

Samza's ``$table`` source-name convention (ConfigBasedIOResolverFactory.
java:41-78) marks the lookup side of a stream-table join; here a source
registered via ``add_table`` plays that role and is broadcast-hinted.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from samza_spark.functions.builtins import register_builtins
from samza_spark.sql.parser import (
    SqlStatement,
    parse_statements,
    rewrite_distinct_on,
    rewrite_qualify,
)
from samza_spark.sql.validator import validate_compat


def rewrite_builtins(select_sql: str, compat_mode: bool = True) -> str:
    """Rewrite reference UDF spellings to native Spark SQL so they run
    inside Catalyst (no Python UDF in the path):

    * ``GetSqlField(col, 'a.b')`` / ``GetNestedField`` -> ``col.a.b``
    * ``flatten(col)``            -> ``explode(col)`` (ProjectTranslator.java:147-174)
      — compat mode only: Spark's native ``flatten(array<array<T>>)`` is a
      different, valid function that extension-mode SQL must keep.
    * ``BuildOutputRecord('k', v, ...)`` -> ``named_struct(...)``
    * ``ConvertToString(x)``      -> ``cast(x as string)``
    * ``RegexMatch(p, s)``        -> ``s rlike p``
    """
    out = re.sub(
        r"\b(?:GetSqlField|GetNestedField)\s*\(\s*([\w.]+)\s*,\s*'([\w.]+)'\s*\)",
        lambda m: f"{m.group(1)}.{m.group(2)}",
        select_sql,
        flags=re.IGNORECASE,
    )
    if compat_mode:
        out = re.sub(r"\bflatten\s*\(", "explode(", out, flags=re.IGNORECASE)
    out = re.sub(r"\bBuildOutputRecord\s*\(", "named_struct(", out, flags=re.IGNORECASE)
    out = re.sub(
        r"\bConvertToString\s*\(([^()]*)\)",
        lambda m: f"cast({m.group(1)} as string)",
        out,
        flags=re.IGNORECASE,
    )
    out = re.sub(
        r"\bRegexMatch\s*\(\s*(\'[^\']*\')\s*,\s*([\w.]+)\s*\)",
        lambda m: f"({m.group(2)} rlike {m.group(1)})",
        out,
        flags=re.IGNORECASE,
    )
    return out


@dataclass
class SqlApplication:
    """A multi-statement SQL job (fan-in/fan-out supported, matching
    TestSamzaSqlEndToEnd.java:186-287)."""

    spark: SparkSession
    compat_mode: bool = False
    # Samza fixes streaming GROUP BY to a tumbling window of
    # `samza.sql.groupby.window.ms` (default 5 min) in DISCARDING mode —
    # SamzaSqlApplicationConfig.java:91-99, LogicalAggregateTranslator.java:
    # 62-87. Applied only to streaming sources in compat mode.
    groupby_window_ms: int = 300_000
    _sinks: dict = field(default_factory=dict)
    _tables: set = field(default_factory=set)
    _sink_schemas: dict = field(default_factory=dict)

    def __post_init__(self):
        register_builtins(self.spark)

    # -- registration ------------------------------------------------------

    def add_stream(self, name: str, stream_or_df) -> "SqlApplication":
        df = getattr(stream_or_df, "df", stream_or_df)
        df.createOrReplaceTempView(name)
        return self

    def add_table(self, name: str, table_or_df) -> "SqlApplication":
        """Register the `$table` side of stream-table joins; broadcast-
        hinted at plan time via the view itself being small/static."""
        df = getattr(table_or_df, "df", table_or_df)
        df.createOrReplaceTempView(name)
        self._tables.add(name)
        return self

    def add_sink(self, name: str, sink, schema=None) -> "SqlApplication":
        """Register a sink; an optional declared ``schema`` (DDL string or
        StructType) is enforced against every INSERT's projected schema
        (SamzaSqlValidator.java:180-254 output-record validation)."""
        self._sinks[name] = sink
        if schema is not None:
            self._sink_schemas[name] = schema
        return self

    # -- execution ---------------------------------------------------------

    def _plan(self, stmt: SqlStatement) -> DataFrame:
        if self.compat_mode:
            validate_compat(stmt.select, spark=self.spark)
            streams = [t for t in stmt.source_tables if t not in self._tables]
            if len(streams) > 1:
                # JoinTranslator.java:210-212
                from samza_spark.sql.validator import SqlValidationError

                raise SqlValidationError("Stream-stream join is not yet supported")
        sql = rewrite_builtins(stmt.select, compat_mode=self.compat_mode)
        # QUALIFY (window filter) is sugar Spark lacks; rewrite is a no-op
        # for statements without a top-level QUALIFY
        sql = rewrite_qualify(sql)
        sql = rewrite_distinct_on(sql)
        df = self.spark.sql(sql)
        if self.compat_mode and df.isStreaming:
            windowed = self._windowed_groupby(stmt.select)
            if windowed is not None:
                df = self.spark.sql(windowed)
        return df

    def _windowed_groupby(self, select_sql: str) -> str | None:
        """Compat streaming aggregation: rewrite ``GROUP BY k`` to
        ``GROUP BY k, window(current_timestamp(), '<ms>')`` — Samza's
        config-fixed processing-time tumble (the translator keys window
        state by arrival clock; ``current_timestamp()`` is the micro-batch
        timestamp, Spark's processing-time proxy). The window bounds are
        appended as ``window_start``/``window_end`` columns."""
        m = re.search(r"\bgroup\s+by\b(?P<keys>.+)$", select_sql, re.IGNORECASE | re.DOTALL)
        if not m:
            return None
        secs = max(1, self.groupby_window_ms // 1000)
        win = f"window(current_timestamp(), '{secs} seconds')"
        rewritten = re.sub(
            r"(\bselect\b)",
            rf"\1 __w.start AS window_start, __w.end AS window_end,",
            select_sql,
            count=1,
            flags=re.IGNORECASE,
        )
        rewritten = re.sub(
            r"(\bgroup\s+by\b)",
            rf"\1 __w,",
            rewritten,
            count=1,
            flags=re.IGNORECASE,
        )
        # bind the window expression via a lateral alias in the FROM? No —
        # simplest valid spelling: group by the window expr and re-project
        rewritten = rewritten.replace("__w.start", f"{win}.start").replace(
            "__w.end", f"{win}.end"
        ).replace("__w,", f"{win},")
        return rewrite_builtins(rewritten)

    def _execute_merge(self, mg) -> DataFrame:
        """Relational MERGE INTO over registered views: unmatched target
        rows pass through; matched rows are deleted / replaced by the
        source row (SET *); unmatched source rows insert (INSERT *). The
        merged result re-registers the target view and is returned.

        Plan shape (pipeline.versioning.merge_upsert's contract): windows
        and filters touch only the CHANGE side; the target contributes
        hash semi/anti joins on the key — never a sort. Bucketing both
        sides on the key makes the joins exchange-free at warehouse
        scale."""
        target = self.spark.table(mg.target)
        source = self.spark.table(mg.source)
        cols = target.columns
        missing = [c for c in cols if c not in source.columns]
        if mg.has_update or mg.has_insert:
            if missing:
                raise ValueError(
                    f"MERGE SET */INSERT * needs source columns {missing!r} "
                    f"(source has {source.columns!r})"
                )
        tk, sk = mg.target_key, mg.source_key
        src_keys = source.select(F.col(sk).alias(tk)).distinct()
        tgt_keys = target.select(F.col(tk).alias(sk)).distinct()
        out = target.join(src_keys, on=tk, how="left_anti")
        m_src = source.join(tgt_keys, on=sk, how="left_semi")
        not_deleted = (
            (~F.expr(mg.delete_cond)) if mg.delete_cond else F.lit(True)
        )
        if mg.has_update:
            out = out.unionByName(
                m_src.filter(not_deleted).select(*[F.col(c) for c in cols])
            )
        else:
            matched_t = target.join(src_keys, on=tk, how="left_semi")
            if mg.delete_cond:
                del_keys = (
                    m_src.filter(F.expr(mg.delete_cond))
                    .select(F.col(sk).alias(tk))
                    .distinct()
                )
                matched_t = matched_t.join(del_keys, on=tk, how="left_anti")
            out = out.unionByName(matched_t)
        if mg.has_insert:
            new_src = source.join(tgt_keys, on=sk, how="left_anti")
            out = out.unionByName(
                new_src.filter(not_deleted).select(*[F.col(c) for c in cols])
            )
        out.createOrReplaceTempView(mg.target)
        return out

    def run(self, sql: str) -> list:
        """Execute each statement; INSERTs go to their registered sink
        (returning whatever the sink returns — a StreamingQuery for
        streaming sinks, None for batch); bare SELECTs return DataFrames;
        MERGE INTO statements merge into (and re-register) the target
        view and return the merged DataFrame."""
        from samza_spark.sql.parser import parse_merge, split_statements

        results = []
        for raw in split_statements(sql):
            mg = parse_merge(raw)
            if mg is not None:
                results.append(self._execute_merge(mg))
                continue
            stmt = parse_statements(raw)[0]
            df = self._plan(stmt)
            if stmt.sink is None:
                results.append(df)
            else:
                if stmt.sink not in self._sinks:
                    raise KeyError(f"sink {stmt.sink!r} not registered")
                if stmt.sink in self._sink_schemas:
                    from samza_spark.sql.validator import validate_output_schema

                    validate_output_schema(df.schema, self._sink_schemas[stmt.sink])
                results.append(self._sinks[stmt.sink].write(df))
        return results

    def explain(self, sql: str) -> None:
        for stmt in parse_statements(sql):
            self._plan(stmt).explain("formatted")
