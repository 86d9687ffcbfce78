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
    r"^\s*insert\s+into\s+(?P<sink>[A-Za-z_][\w.$]*)\s+(?P<select>select\b.*)$",
    re.IGNORECASE | re.DOTALL,
)
_SELECT_RE = re.compile(r"^\s*select\b", re.IGNORECASE)


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
        return list(dict.fromkeys(ids))


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
        "only 'INSERT INTO <sink> SELECT ...' and bare 'SELECT ...' are "
        f"supported (SamzaSqlQueryParser.java:100); got: {sql[:80]!r}"
    )


def parse_statements(sql: str) -> list[SqlStatement]:
    return [parse_statement(s) for s in split_statements(sql)]
