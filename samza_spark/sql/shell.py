"""Interactive SQL shell: the CliShell/SamzaExecutor analog.

Reference (SURVEY.md §3.4): samza-sql-shell/.../cli/CliShell.java +
impl/SamzaExecutor.java with command set ``SELECT`` (transient live view),
``INSERT INTO``, ``SHOW TABLES``, ``SHOW FUNCTIONS``, ``DESCRIBE``,
``LS`` / ``STOP`` / ``RM`` executions, ``SET`` (impl/CliCommandType.java:
30-46). Here each command maps onto the SqlApplication runner + Spark
catalog; a streaming SELECT becomes a transient memory-sink query whose
rows the shell polls — the same "live view" behavior the reference gets
from its in-memory view buffer (SamzaExecutor.java consumeQueueEntries).

The engine-facing class is ``ShellSession`` (fully testable, no I/O);
``repl()`` is the thin stdin loop (tools/sql_shell.py entry point).
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from samza_spark.sql.parser import parse_statement
from samza_spark.sql.runner import SqlApplication


@dataclass
class ShellResult:
    kind: str  # rows | text | execution | ok
    text: str = ""
    rows: list = field(default_factory=list)
    columns: list = field(default_factory=list)
    execution_id: int | None = None


@dataclass
class _Execution:
    id: int
    statement: str
    query: object | None  # StreamingQuery for streaming, None for batch

    @property
    def status(self) -> str:
        if self.query is None:
            return "FINISHED"
        return "RUNNING" if self.query.isActive else "STOPPED"


class ShellSession:
    """One shell session: registered sources/sinks + tracked executions."""

    def __init__(self, spark: SparkSession, app: SqlApplication | None = None):
        self.spark = spark
        self.app = app or SqlApplication(spark)
        self._executions: dict[int, _Execution] = {}
        self._ids = itertools.count(1)
        self._select_limit = 100
        self._buffer: list[str] = []
        self._matviews: dict[str, str] = {}  # name -> defining SELECT
        self._mv_dir: str | None = None  # lazily created storage root

    # -- command dispatch --------------------------------------------------

    def feed(self, line: str) -> "ShellResult | None":
        """Multi-line entry (CliShell.java behavior): SQL statements
        buffer across lines until a terminating ``;``; meta commands
        (SHOW/LS/STOP/... and a lone EXIT) execute immediately when not
        mid-statement. Returns ``None`` while a statement is still open.
        """
        if not self._buffer:
            stripped = line.strip()
            if not stripped:
                return ShellResult("ok")
            head = stripped.split()[0].upper()
            if head not in (
                "SELECT", "INSERT", "MERGE", "CREATE", "WITH"
            ) or stripped.endswith(";"):
                return self.execute(stripped)
            self._buffer.append(stripped)
            return None
        self._buffer.append(line.strip())
        if line.strip().endswith(";"):
            stmt = " ".join(self._buffer)
            self._buffer.clear()
            return self.execute(stmt)
        return None

    @property
    def pending(self) -> bool:
        """True when feed() is mid-statement (REPL continuation prompt)."""
        return bool(self._buffer)

    def execute(self, line: str) -> ShellResult:
        line = line.strip().rstrip(";")
        if not line:
            return ShellResult("ok")
        upper = line.upper()
        if upper in ("EXIT", "QUIT"):
            raise SystemExit(0)
        if upper == "SHOW TABLES":
            return self._show_tables()
        if upper == "SHOW FUNCTIONS":
            return self._show_functions()
        if upper.startswith("DESCRIBE "):
            return self._describe(line.split(None, 1)[1])
        if upper == "LS":
            return self._ls()
        if upper.startswith("STOP "):
            return self._stop(int(line.split()[1]), remove=False)
        if upper.startswith("RM "):
            return self._stop(int(line.split()[1]), remove=True)
        if upper.startswith("SET"):
            return self._set(line[3:].strip())
        if upper.startswith("EXPLAIN ANALYZE "):
            return self._explain_analyze(line.split(None, 2)[2])
        if upper.startswith("EXPLAIN "):
            return self._explain(line.split(None, 1)[1])
        if upper == "SHOW MATERIALIZED VIEWS":
            return ShellResult(
                "rows",
                rows=sorted((n,) for n in self._matviews),
                columns=["materialized_view"],
            )
        if upper.startswith("CREATE MATERIALIZED VIEW "):
            return self._create_matview(line)
        if upper.startswith("REFRESH MATERIALIZED VIEW "):
            return self._refresh_matview(line.split()[-1])
        if (
            upper.startswith("SELECT")
            or upper.startswith("INSERT")
            or upper.startswith("WITH")
        ):
            # WITH [RECURSIVE] ... SELECT runs on Spark's native CTE
            # support (recursive CTEs execute as an iterative union in
            # Spark 4; parser.py routes the whole statement to Catalyst).
            return self._sql(line)
        if upper.startswith("MERGE"):
            from samza_spark.sql.parser import parse_merge

            mg = parse_merge(line)
            if mg is None:
                return ShellResult("text", text="malformed MERGE statement")
            merged = self.app._execute_merge(mg)
            return ShellResult(
                "text",
                text=f"merged into '{mg.target}' ({merged.count()} rows)",
            )
        return ShellResult("text", text=f"unknown command: {line.split()[0]}")

    # -- materialized views --------------------------------------------------

    _MV_CREATE_RE = None  # compiled lazily below

    def _create_matview(self, line: str) -> ShellResult:
        """``CREATE MATERIALIZED VIEW name AS SELECT ...``: compute the
        SELECT once, persist it as parquet under the session's MV root,
        and register the READ-BACK as the view — queries against it scan
        the materialization, not the defining plan (the warehouse MV
        contract; pipeline.matview holds the incremental-refresh
        algebra, this is the SQL-surface full-refresh form)."""
        import re as _re

        m = _re.match(
            r"^\s*create\s+materialized\s+view\s+([A-Za-z_]\w*)\s+as\s+(select\b.*)$",
            line,
            _re.IGNORECASE | _re.DOTALL,
        )
        if m is None:
            return ShellResult("text", text="malformed CREATE MATERIALIZED VIEW")
        name, select = m.group(1), m.group(2)
        self._matviews[name] = select
        n = self._materialize(name)
        return ShellResult(
            "text", text=f"materialized view '{name}' ({n} rows)"
        )

    def _refresh_matview(self, name: str) -> ShellResult:
        """``REFRESH MATERIALIZED VIEW name``: recompute the stored
        SELECT and swap the materialization (full refresh)."""
        if name not in self._matviews:
            return ShellResult("text", text=f"unknown materialized view '{name}'")
        n = self._materialize(name)
        return ShellResult("text", text=f"refreshed '{name}' ({n} rows)")

    def _materialize(self, name: str) -> int:
        import os
        import tempfile

        from samza_spark.sql.parser import parse_statement

        if self._mv_dir is None:
            self._mv_dir = tempfile.mkdtemp(prefix="ss_shell_mv_")
        df = self.app._plan(parse_statement(self._matviews[name]))
        path = os.path.join(self._mv_dir, name)
        df.write.mode("overwrite").parquet(path)
        back = self.spark.read.parquet(path)
        back.createOrReplaceTempView(name)
        return back.count()

    def _explain_analyze(self, sql: str) -> ShellResult:
        """``EXPLAIN ANALYZE <select>``: the EXPLAIN output (physical
        plan + scale advisor) plus an actual execution — wall seconds
        and row count — so a shell user sees predicted hazards and
        measured cost side by side."""
        import time as _time

        from samza_spark.sql.parser import parse_statement

        base = self._explain(sql)
        df = self.app._plan(parse_statement(sql))
        t0 = _time.perf_counter()
        n = df.count()
        secs = _time.perf_counter() - t0
        return ShellResult(
            "text",
            text=f"{base.text}\n\nanalyze: {n} rows in {secs:.3f}s",
        )

    # -- metadata commands -------------------------------------------------

    def _show_tables(self) -> ShellResult:
        names = sorted(t.name for t in self.spark.catalog.listTables())
        return ShellResult("rows", rows=[(n,) for n in names], columns=["table"])

    def _show_functions(self) -> ShellResult:
        # the reference lists registered Samza UDFs (SamzaExecutor.java);
        # ours are the rewritten builtins + anything in the session registry
        builtins = [
            "BuildOutputRecord",
            "ConvertToString",
            "Flatten",
            "GetNestedField",
            "GetSqlField",
            "RegexMatch",
        ]
        return ShellResult("rows", rows=[(n,) for n in builtins], columns=["function"])

    def _describe(self, table: str) -> ShellResult:
        df = self.spark.table(table)
        rows = [(f.name, f.dataType.simpleString(), f.nullable) for f in df.schema.fields]
        return ShellResult("rows", rows=rows, columns=["column", "type", "nullable"])

    def _ls(self) -> ShellResult:
        rows = [
            (e.id, e.status, e.statement[:60]) for e in self._executions.values()
        ]
        return ShellResult("rows", rows=rows, columns=["id", "status", "statement"])

    def _stop(self, exec_id: int, remove: bool) -> ShellResult:
        e = self._executions.get(exec_id)
        if e is None:
            return ShellResult("text", text=f"no execution {exec_id}")
        if e.query is not None and e.query.isActive:
            e.query.stop()
        if remove:
            del self._executions[exec_id]
        return ShellResult("ok", text=f"{'removed' if remove else 'stopped'} {exec_id}")

    def _set(self, kv: str) -> ShellResult:
        if not kv:
            return ShellResult("text", text="usage: SET key=value")
        m = re.match(r"([\w.]+)\s*=\s*(.+)", kv)
        if not m:
            return ShellResult("text", text="usage: SET key=value")
        self.spark.conf.set(m.group(1), m.group(2).strip())
        return ShellResult("ok", text=f"set {m.group(1)}")

    # -- SQL ---------------------------------------------------------------

    def _sql(self, sql: str) -> ShellResult:
        stmt = parse_statement(sql)
        if stmt.sink is None:
            df = self.app._plan(stmt)
            if df.isStreaming:
                # transient live view: memory sink the shell can poll
                exec_id = next(self._ids)
                name = f"shell_view_{exec_id}"
                q = (
                    df.writeStream.format("memory")
                    .queryName(name)
                    .outputMode("append")
                    .start()
                )
                self._executions[exec_id] = _Execution(exec_id, sql, q)
                return ShellResult(
                    "execution",
                    execution_id=exec_id,
                    text=f"live view '{name}' (poll with SELECT * FROM {name}; STOP {exec_id} to end)",
                )
            rows = df.limit(self._select_limit).collect()
            return ShellResult("rows", rows=rows, columns=df.columns)
        [result] = self.app.run(sql)
        exec_id = next(self._ids)
        self._executions[exec_id] = _Execution(exec_id, sql, result)
        return ShellResult("execution", execution_id=exec_id)

    def _explain(self, sql: str) -> ShellResult:
        """EXPLAIN <select>: the physical plan plus the scale advisor's
        findings (samza_spark.advisor.plan_audit) and, when the statement
        has extractable equi-join edges over registered views, the
        sketch-CBO's per-edge cardinality/broadcast/order advice
        (samza_spark.advisor.sql_join_advice) — the shell-level answer
        to "will this query survive the full corpus"."""
        from samza_spark.advisor import (
            explain_formatted,
            plan_audit,
            sql_join_advice,
        )

        stmt = parse_statement(sql)
        df = self.app._plan(stmt)
        findings = plan_audit(df)
        lines = [explain_formatted(df).rstrip(), ""]
        if findings:
            lines.append("scale advisor:")
            lines += [
                f"  [{f['severity']}] {f['code']}: {f['detail']}"
                for f in findings
            ]
        else:
            lines.append("scale advisor: no known hazard shapes")
        try:
            advice = sql_join_advice(self.spark, stmt.select)
        except Exception as e:  # advisory only — EXPLAIN must still print
            advice = None
            lines.append(f"join advisor: unavailable ({type(e).__name__}: {e})")
        if advice is not None:
            lines.append("join advisor (count-min sketch CBO):")
            for r in advice.orderBy("join_rank").collect():
                lines.append(
                    f"  #{r['join_rank']} {r['edge']}: "
                    f"est_join_size={r['est_join_size']} "
                    f"rows={r['left_rows']}x{r['right_rows']} "
                    f"strategy={r['strategy']} build_side={r['build_side']}"
                )
        return ShellResult("text", text="\n".join(lines))

    def view_rows(self, exec_id: int) -> list:
        """Poll a live view started by a streaming SELECT."""
        return self.spark.sql(f"SELECT * FROM shell_view_{exec_id}").collect()

    # -- tab completion ----------------------------------------------------

    COMMANDS = (
        "SELECT", "INSERT", "MERGE", "EXPLAIN", "SHOW", "DESCRIBE", "LS",
        "STOP", "RM", "SET", "EXIT", "CREATE", "REFRESH", "WITH",
    )
    SQL_KEYWORDS = (
        "FROM", "WHERE", "GROUP BY", "ORDER BY", "HAVING", "JOIN", "ON",
        "LIMIT", "AS", "AND", "OR", "NOT", "CASE", "WHEN", "THEN", "ELSE",
        "END", "LIKE", "DISTINCT", "UNION", "EXCEPT", "INTERSECT",
    )

    def completions(self, buffer: str, prefix: str) -> "list[str]":
        """Candidates for the word ``prefix`` being typed at the end of
        ``buffer`` — CliShell.java tab-completion parity (the reference
        shell completes commands and catalog names via jline): command
        keywords at line start, table names after FROM/INTO/JOIN/
        DESCRIBE, TABLES/FUNCTIONS after SHOW, and functions + tables +
        SQL keywords inside a SELECT/INSERT body. Pure function of the
        session catalog — ``repl()`` wires it to readline."""
        before = (
            buffer[: len(buffer) - len(prefix)]
            if prefix and buffer.endswith(prefix)
            else buffer
        )
        words = before.split()
        lowpref = prefix.lower()

        def match(cands):
            return sorted(c for c in cands if c.lower().startswith(lowpref))

        if not words and not self._buffer:
            return match(self.COMMANDS)
        head = (self._buffer[0].split()[0].upper() if self._buffer else
                (words[0].upper() if words else ""))
        prev = words[-1].upper() if words else ""
        if prev in ("FROM", "INTO", "JOIN", "DESCRIBE"):
            return match(t.name for t in self.spark.catalog.listTables())
        if head == "SHOW" or prev == "SHOW":
            return match(("TABLES", "FUNCTIONS"))
        if head in ("SELECT", "INSERT"):
            tables = [t.name for t in self.spark.catalog.listTables()]
            functions = [r[0] for r in self._show_functions().rows]
            return match(list(self.SQL_KEYWORDS) + tables + functions)
        return []


def repl(spark: SparkSession, app: SqlApplication | None = None) -> None:
    """Minimal stdin REPL over ShellSession."""
    sess = ShellSession(spark, app)
    try:  # tab completion (CliShell jline parity); absent readline is fine
        import readline

        def _complete(text: str, state: int):
            cands = sess.completions(readline.get_line_buffer(), text)
            return cands[state] if state < len(cands) else None

        readline.set_completer_delims(" \t\n;,()=")
        readline.set_completer(_complete)
        readline.parse_and_bind("tab: complete")
    except ImportError:
        pass
    print("samza-spark sql shell — SELECT [DISTINCT ON]/[QUALIFY] / "
          "WITH [RECURSIVE] / INSERT INTO / MERGE / CREATE|REFRESH "
          "MATERIALIZED VIEW / EXPLAIN [ANALYZE] / SHOW TABLES|FUNCTIONS / "
          "DESCRIBE <t> / LS / STOP <id> / RM <id> / SET k=v / EXIT")
    while True:
        try:
            line = input("...> " if sess.pending else "sql> ")
        except (EOFError, KeyboardInterrupt):
            print()
            return
        try:
            r = sess.feed(line)
        except SystemExit:
            return
        except Exception as exc:  # surface, keep shell alive (CliShell behavior)
            print(f"error: {exc}")
            continue
        if r is None:
            continue
        if r.kind == "rows":
            print("\t".join(r.columns))
            for row in r.rows:
                print("\t".join(str(v) for v in row))
        elif r.text:
            print(r.text)
        elif r.kind == "execution":
            print(f"execution {r.execution_id} started")


def main(argv: "list[str] | None" = None) -> int:
    """CLI entry (``python -m samza_spark sql-shell``): default engine
    session, fresh SqlApplication, interactive repl."""
    from samza_spark.session import get_session

    repl(get_session())
    return 0
