"""Statement parser for the Samza SQL entry syntax.

Reference: SamzaSqlQueryParser (/root/reference samza-sql/.../util/
SamzaSqlQueryParser.java:100) — the only statement forms are
``INSERT INTO <sink> SELECT ...`` plus bare ``SELECT`` (shell). Multi-
statement jobs are a list of INSERTs (fan-in/fan-out tested at
samza-test/.../samzasql/TestSamzaSqlEndToEnd.java:186-287).

We split the sink from the SELECT here and hand the SELECT itself to
Spark's parser — Calcite's job in the reference (QueryPlanner.java:194-204)
is Catalyst's job for us; there is nothing to gain from a hand-rolled
relational parser.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_INSERT_RE = re.compile(
    r"^\s*insert\s+into\s+(?P<sink>[A-Za-z_][\w.$]*)\s+"
    r"(?P<select>(?:select|with)\b.*)$",
    re.IGNORECASE | re.DOTALL,
)
# WITH [RECURSIVE] is an extension beyond the reference's two statement
# forms (SamzaSqlQueryParser.java:100 accepts only INSERT INTO / SELECT);
# Spark 4 executes recursive CTEs natively, so the parser only needs to
# recognize the prefix and hand the whole statement to Catalyst.
_SELECT_RE = re.compile(r"^\s*(?:select|with)\b", re.IGNORECASE)


@dataclass(frozen=True)
class SqlStatement:
    sink: str | None  # None for bare SELECT (shell mode)
    select: str
    raw: str

    @property
    def source_tables(self) -> list[str]:
        """Table identifiers referenced in FROM/JOIN clauses (heuristic
        scan; adequate for the Samza-compat statement shapes)."""
        ids = re.findall(
            r"\b(?:from|join)\s+([A-Za-z_][\w.$]*)",
            re.sub(r"\(\s*select", "( select", self.select, flags=re.IGNORECASE),
            re.IGNORECASE,
        )
        ctes = set(
            re.findall(
                r"\b([A-Za-z_]\w*)\s*(?:\([^)]*\))?\s+as\s*\(",
                self.select,
                re.IGNORECASE,
            )
        )
        return list(dict.fromkeys(i for i in ids if i not in ctes))


def split_statements(sql: str) -> list[str]:
    """Split on top-level semicolons (no string-literal semicolon support
    needed by the reference corpus; quoted semicolons are respected)."""
    parts, buf, depth, in_str = [], [], 0, False
    for ch in sql:
        if ch == "'" and not in_str:
            in_str = True
        elif ch == "'" and in_str:
            in_str = False
        if ch == "(" and not in_str:
            depth += 1
        elif ch == ")" and not in_str:
            depth -= 1
        if ch == ";" and depth == 0 and not in_str:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if "".join(buf).strip():
        parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def parse_statement(sql: str) -> SqlStatement:
    m = _INSERT_RE.match(sql)
    if m:
        return SqlStatement(sink=m.group("sink"), select=m.group("select").strip(), raw=sql)
    if _SELECT_RE.match(sql):
        return SqlStatement(sink=None, select=sql.strip(), raw=sql)
    raise ValueError(
        "only 'INSERT INTO <sink> SELECT ...', bare 'SELECT ...', and "
        "'WITH [RECURSIVE] ... SELECT ...' are supported "
        f"(SamzaSqlQueryParser.java:100 + CTE extension); got: {sql[:80]!r}"
    )


def parse_statements(sql: str) -> list[SqlStatement]:
    return [parse_statement(s) for s in split_statements(sql)]


# -- MERGE INTO (warehouse-ingest extension beyond the reference's two
# statement forms; Spark SQL itself only accepts MERGE with a v2/Delta
# catalog, so the engine provides the relational execution) -------------

_MERGE_RE = re.compile(
    r"^\s*merge\s+into\s+(?P<target>[A-Za-z_][\w.$]*)"
    r"(?:\s+(?:as\s+)?(?P<talias>[A-Za-z_]\w*))?"
    r"\s+using\s+(?P<source>[A-Za-z_][\w.$]*)"
    r"(?:\s+(?:as\s+)?(?P<salias>[A-Za-z_]\w*))?"
    r"\s+on\s+(?P<left>[\w.$]+)\s*=\s*(?P<right>[\w.$]+)"
    r"(?P<clauses>(?:\s+when\b.*)?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_WHEN_DELETE_RE = re.compile(
    r"when\s+matched\s+and\s+(?P<cond>.+?)\s+then\s+delete",
    re.IGNORECASE | re.DOTALL,
)
_WHEN_UPDATE_RE = re.compile(
    r"when\s+matched\s+then\s+update\s+set\s+\*", re.IGNORECASE
)
_WHEN_INSERT_RE = re.compile(
    r"when\s+not\s+matched\s+then\s+insert\s+\*", re.IGNORECASE
)


@dataclass(frozen=True)
class MergeStatement:
    """``MERGE INTO t [AS a] USING s [AS b] ON a.k = b.k`` with the
    CDC-idiom clause set: ``WHEN MATCHED AND <cond> THEN DELETE``,
    ``WHEN MATCHED THEN UPDATE SET *``, ``WHEN NOT MATCHED THEN INSERT
    *`` (each optional). The delete condition may reference source
    columns (qualified by the source alias or not)."""

    target: str
    source: str
    target_key: str
    source_key: str
    delete_cond: "str | None"
    has_update: bool
    has_insert: bool
    raw: str


def _resolve_side(side: str, target: str, talias: str, source: str, salias: str):
    """('t'|'s', column) for one side of the ON equality."""
    if "." in side:
        qual, col = side.rsplit(".", 1)
        if qual in (talias, target):
            return "t", col
        if qual in (salias, source):
            return "s", col
        raise ValueError(f"ON references unknown alias {qual!r}")
    return None, side  # unqualified: same-named key in both


def parse_merge(sql: str) -> "MergeStatement | None":
    m = _MERGE_RE.match(sql)
    if not m:
        return None
    target, source = m.group("target"), m.group("source")
    talias = m.group("talias") or target
    salias = m.group("salias") or source
    l_side = _resolve_side(m.group("left"), target, talias, source, salias)
    r_side = _resolve_side(m.group("right"), target, talias, source, salias)
    sides = {s[0]: s[1] for s in (l_side, r_side) if s[0]}
    if not sides:  # both unqualified -> same name
        tk = sk = l_side[1]
        if l_side[1] != r_side[1]:
            raise ValueError(
                "unqualified ON with different column names is ambiguous; "
                "qualify with the table aliases"
            )
    else:
        tk = sides.get("t", l_side[1] if l_side[0] is None else r_side[1])
        sk = sides.get("s", l_side[1] if l_side[0] is None else r_side[1])
    clauses = m.group("clauses") or ""
    leftover = clauses
    dm = _WHEN_DELETE_RE.search(clauses)
    delete_cond = None
    if dm:
        delete_cond = re.sub(
            rf"\b(?:{re.escape(salias)}|{re.escape(source)})\.", "", dm.group("cond")
        ).strip()
        leftover = leftover.replace(dm.group(0), "")
    has_update = bool(_WHEN_UPDATE_RE.search(clauses))
    if has_update:
        leftover = _WHEN_UPDATE_RE.sub("", leftover)
    has_insert = bool(_WHEN_INSERT_RE.search(clauses))
    if has_insert:
        leftover = _WHEN_INSERT_RE.sub("", leftover)
    if leftover.strip():
        raise ValueError(
            "unsupported MERGE clause(s): "
            f"{leftover.strip()[:60]!r} (supported: WHEN MATCHED AND c THEN "
            "DELETE / WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED "
            "THEN INSERT *)"
        )
    if not (has_update or has_insert or delete_cond):
        raise ValueError("MERGE needs at least one WHEN clause")
    return MergeStatement(
        target=target,
        source=source,
        target_key=tk,
        source_key=sk,
        delete_cond=delete_cond,
        has_update=has_update,
        has_insert=has_insert,
        raw=sql,
    )


# -- QUALIFY (window-filter extension; Snowflake/DuckDB syntax) ----------

_QUALIFY_RE = re.compile(r"\bqualify\b", re.IGNORECASE)
_TRAIL_RE = re.compile(r"\b(order\s+by|limit)\b", re.IGNORECASE)


def _top_level_match(sql: str, regex: re.Pattern) -> "re.Match | None":
    """First match of ``regex`` at paren-depth 0 outside string literals."""
    depth, in_str = 0, False
    for m in regex.finditer(sql):
        i = m.start()
        d, s = 0, False
        for ch in sql[:i]:
            if ch == "'":
                s = not s
            elif ch == "(" and not s:
                d += 1
            elif ch == ")" and not s:
                d -= 1
        if d == 0 and not s:
            return m
    return None


def _rewrite_subqueries(sql: str, rewrite) -> str:
    """Apply ``rewrite`` to the content of every parenthesized group
    (depth-first — inner groups are handled by the recursive call the
    rewriter itself makes), skipping string literals. This is what lets
    QUALIFY / DISTINCT ON appear inside FROM subqueries, not just at the
    statement's top level: each subquery body is itself a SELECT the
    same rewrite understands. Non-SELECT groups (function args, IN
    lists) pass through the rewriter unchanged by its own guards."""
    res, last = [], 0
    i, n, in_str = 0, len(sql), False
    while i < n:
        ch = sql[i]
        if ch == "'":
            in_str = not in_str
        elif ch == "(" and not in_str:
            d, j, s2 = 1, i + 1, False
            while j < n and d:
                c2 = sql[j]
                if c2 == "'":
                    s2 = not s2
                elif not s2:
                    if c2 == "(":
                        d += 1
                    elif c2 == ")":
                        d -= 1
                j += 1
            inner = sql[i + 1 : j - 1]
            res.append(sql[last : i + 1])
            res.append(rewrite(inner))
            last = j - 1
            i = j - 1
        i += 1
    res.append(sql[last:])
    return "".join(res)


def rewrite_qualify(sql: str) -> str:
    """Rewrite ``SELECT ... QUALIFY <pred> [ORDER BY ...] [LIMIT n]`` into
    standard Spark SQL — Spark has no native QUALIFY, but the clause is
    pure sugar for "filter on a window expression after projection":

        SELECT * EXCEPT(__qualify__) FROM (
          SELECT *, (<pred>) AS __qualify__ FROM ( <head> ) __q_src
        ) __q_flt WHERE __qualify__ [trailing]

    The predicate may reference projected aliases or inline window
    functions over the inner SELECT's output (both evaluate in the
    wrapper's projection context). Statements without a top-level
    QUALIFY pass through unchanged, so the rewrite is safe to apply
    unconditionally in the SQL path. Subqueries are rewritten first
    (depth-first), so a QUALIFY nested inside a FROM subquery works."""
    sql = _rewrite_subqueries(sql, rewrite_qualify)
    m = _top_level_match(sql, _QUALIFY_RE)
    if m is None:
        return sql
    head, tail = sql[: m.start()].rstrip(), sql[m.end() :].strip()
    t = _top_level_match(tail, _TRAIL_RE)
    if t is not None:
        pred, trailing = tail[: t.start()].rstrip(), " " + tail[t.start() :]
    else:
        pred, trailing = tail, ""
    return (
        "SELECT * EXCEPT(__qualify__) FROM ("
        f"SELECT *, ({pred}) AS __qualify__ FROM ({head}) __q_src"
        f") __q_flt WHERE __qualify__{trailing}"
    )


# -- DISTINCT ON (Postgres/DuckDB first-row-per-key extension) -----------

_DISTINCT_ON_PREFIX_RE = re.compile(
    r"^\s*select\s+distinct\s+on\s*\(", re.IGNORECASE
)
_ORDER_BY_RE = re.compile(r"\border\s+by\b", re.IGNORECASE)
_LIMIT_OFFSET_RE = re.compile(r"\b(limit|offset)\b", re.IGNORECASE)
_SORT_ITEM_RE = re.compile(
    r"(?is)^(?P<expr>.*?)(?P<dir>\s+(?:asc|desc))?"
    r"(?P<nulls>\s+nulls\s+(?:first|last))?\s*$"
)


def _split_top_level_commas(s: str) -> list[str]:
    """Split on commas at paren-depth 0 outside string literals."""
    parts, depth, in_str, start = [], 0, False, 0
    for i, ch in enumerate(s):
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append(s[start:i])
                start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def rewrite_distinct_on(sql: str) -> str:
    """Rewrite ``SELECT DISTINCT ON (k...) proj FROM ... ORDER BY k...,
    tiebreak...`` (Postgres/DuckDB first-row-per-group sugar) into the
    standard row_number pattern Spark understands:

        SELECT * EXCEPT(__don__) FROM (
          SELECT proj, row_number() OVER (
            PARTITION BY k... ORDER BY <full order list>) AS __don__
          FROM ...
        ) __don_src WHERE __don__ = 1

    The window lives in the SAME select as the projection, so keys and
    order expressions may reference base-table columns (they need not be
    projected). Statements without the prefix pass through unchanged.
    Like Postgres, which row wins is defined by the ORDER BY tail; an
    ORDER BY that stops at the keys leaves the winner tied —
    deterministic engines should always pass a tiebreaker.

    A trailing top-level LIMIT/OFFSET is hoisted OUT of the rewrite and
    re-applied after the ``__don__ = 1`` filter (Postgres applies LIMIT
    after DISTINCT ON), and the user's ORDER BY is re-emitted on the
    outer SELECT so the documented output ordering survives: each order
    expression is projected as a hidden ``__don_o{i}`` column inside the
    window select (where base-table columns are still in scope) and the
    outer sort references those, so unprojected order keys work.

    Subqueries rewrite first (a DISTINCT ON inside a FROM subquery
    works), and the key list is parsed with balanced parens, so
    expression keys like ``substr(name, 1, 1)`` are legal."""
    sql = _rewrite_subqueries(sql, rewrite_distinct_on)
    m = _DISTINCT_ON_PREFIX_RE.match(sql)
    if m is None:
        return sql
    # balanced-paren scan for the key list (expression keys may nest)
    i, depth, in_str = m.end(), 1, False
    while i < len(sql) and depth:
        ch = sql[i]
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
        i += 1
    if depth:
        raise ValueError("unbalanced parens in DISTINCT ON key list")
    keys, rest = sql[m.end() : i - 1].strip(), sql[i:]
    om = _top_level_match(rest, _ORDER_BY_RE)
    limit = ""
    if om is not None:
        body, order = rest[: om.start()].rstrip(), rest[om.end() :].strip()
        lm = _top_level_match(order, _LIMIT_OFFSET_RE)
        if lm is not None:
            order, limit = (
                order[: lm.start()].rstrip(),
                " " + order[lm.start() :].strip(),
            )
        emit_order = True
    else:
        body, order, emit_order = rest, keys, False
        lm = _top_level_match(body, _LIMIT_OFFSET_RE)
        if lm is not None:
            body, limit = (
                body[: lm.start()].rstrip(),
                " " + body[lm.start() :].strip(),
            )
    # split "proj FROM ..." at the top-level FROM
    fm = _top_level_match(body, re.compile(r"\bfrom\b", re.IGNORECASE))
    if fm is None:
        raise ValueError("DISTINCT ON requires a FROM clause")
    proj, tail = body[: fm.start()].rstrip(), body[fm.start() :]
    hidden, outer_order, excepts = [], [], ["__don__"]
    if emit_order:
        for i, item in enumerate(_split_top_level_commas(order)):
            sm = _SORT_ITEM_RE.match(item)
            expr = sm.group("expr").strip()
            suffix = (sm.group("dir") or "") + (sm.group("nulls") or "")
            hidden.append(f", ({expr}) AS __don_o{i}")
            outer_order.append(f"__don_o{i}{suffix}")
            excepts.append(f"__don_o{i}")
    order_clause = (
        f" ORDER BY {', '.join(outer_order)}" if outer_order else ""
    )
    return (
        f"SELECT * EXCEPT({', '.join(excepts)}) FROM ("
        f"SELECT {proj}, row_number() OVER ("
        f"PARTITION BY {keys} ORDER BY {order}) AS __don__"
        f"{''.join(hidden)} {tail}"
        f") __don_src WHERE __don__ = 1{order_clause}{limit}"
    )
