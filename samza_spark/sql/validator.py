"""Samza-compat validator: reject what the reference rejects.

Reference: SamzaSqlValidator (/root/reference samza-sql/.../planner/
SamzaSqlValidator.java:72-127 — e.g. "LogicalAggregate with sum function is
not supported"), JoinTranslator validation (JoinTranslator.java:69-76,
198-213), LogicalAggregateTranslator limits (LogicalAggregateTranslator.java:
99-108). SURVEY.md §2.3 lists the full NOT-implemented set.

Our engine *can* run all of these (they're native Spark SQL) — compat mode
exists so a user can check whether a query stays inside the Samza-portable
subset. Default mode is permissive (extensions on).
"""

from __future__ import annotations

import re


class SqlValidationError(ValueError):
    pass


_CHECKS: list[tuple[str, str]] = [
    # (regex on the SELECT text, error message mirroring the reference)
    (r"\border\s+by\b", "ORDER BY is not supported in Samza SQL"),
    (r"\blimit\b", "LIMIT is not supported in Samza SQL"),
    (r"\bunion\b", "UNION is not supported in Samza SQL (use multi-statement fan-in)"),
    (r"\bintersect\b", "INTERSECT is not supported in Samza SQL"),
    (r"\bexcept\b", "EXCEPT is not supported in Samza SQL"),
    (r"\bfull\s+(outer\s+)?join\b", "FULL OUTER JOIN is not supported (JoinTranslator.java:69-76)"),
    (r"\bcross\s+join\b", "CROSS JOIN is not supported (equi-joins only)"),
    (r"\bhaving\b", "HAVING is not supported in Samza SQL"),
    (r"\bover\s*\(", "analytic window functions (OVER) are not supported in Samza SQL"),
    (r"\b(?:cube|rollup|grouping\s+sets)\b", "grouping sets/cube/rollup are not supported"),
]

_AGG_RE = re.compile(r"\b(count|sum|avg|min|max)\s*\(", re.IGNORECASE)


def validate_compat(select_sql: str) -> None:
    """Raise SqlValidationError when `select_sql` leaves the Samza subset."""
    lowered = select_sql.lower()
    for pattern, message in _CHECKS:
        if re.search(pattern, lowered):
            raise SqlValidationError(message)
    has_group_by = re.search(r"\bgroup\s+by\b", lowered)
    aggs = [m.group(1).lower() for m in _AGG_RE.finditer(lowered)]
    if aggs:
        non_count = [a for a in aggs if a != "count"]
        if non_count:
            # SamzaSqlValidator.java:116-127
            raise SqlValidationError(
                f"LogicalAggregate with {non_count[0]} function is not supported"
            )
        if len(aggs) > 1:
            # LogicalAggregateTranslator.java:99-108 — exactly one agg call
            raise SqlValidationError(
                "only a single COUNT aggregate call is supported per query"
            )
        if not has_group_by:
            raise SqlValidationError("aggregate requires GROUP BY in Samza SQL")
    if re.search(r"\bdistinct\b", lowered):
        raise SqlValidationError("DISTINCT aggregates are not supported in Samza SQL")


def validate_output_schema(actual_schema, expected) -> None:
    """Sink output-schema compatibility (SamzaSqlValidator.java:180-254
    validateOutputRecords analog): the SELECT's projected fields must match
    the sink's declared schema by name and type. The reference permits
    missing fields only when the Avro default fills them; we require exact
    name/type correspondence (nullability ignored — Samza's rel schema has
    no nullability either)."""
    from samza_spark.schema import ddl_to_struct

    expected_struct = ddl_to_struct(expected) if isinstance(expected, str) else expected
    actual = {f.name: f.dataType for f in actual_schema.fields}
    wanted = {f.name: f.dataType for f in expected_struct.fields}
    missing = sorted(set(wanted) - set(actual))
    extra = sorted(set(actual) - set(wanted))
    if missing or extra:
        raise SqlValidationError(
            f"output schema mismatch: missing={missing} unexpected={extra} "
            f"(SamzaSqlValidator.java:180-254)"
        )
    wrong = [
        f"{n}: {actual[n].simpleString()} != {wanted[n].simpleString()}"
        for n in wanted
        if actual[n] != wanted[n]
    ]
    if wrong:
        raise SqlValidationError(
            "output schema type mismatch: " + "; ".join(wrong)
        )
