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


def validate_compat(select_sql: str, spark=None) -> None:
    """Raise SqlValidationError when `select_sql` leaves the Samza subset.

    With a ``spark`` session the check runs on the ANALYZED logical plan
    (operator nodes, not query text), so a column literally named
    ``limit``/``except`` can't false-positive; without a session — or when
    the statement can't be analyzed (unregistered views) — it falls back
    to the regex check."""
    if spark is not None:
        try:
            plan = spark.sql(select_sql)._jdf.queryExecution().analyzed()
        except SqlValidationError:
            raise
        except Exception:
            plan = None  # unresolvable here -> textual fallback below
        if plan is not None:
            _validate_plan(plan)
            return
    _validate_text(select_sql)


def _iter_plan_nodes(plan):
    stack = [plan]
    while stack:
        node = stack.pop()
        yield node
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))


def _validate_plan(plan) -> None:
    """Walk analyzed-plan nodes and reject the constructs the reference
    rejects (SamzaSqlValidator.java:72-127, JoinTranslator.java:69-76,
    LogicalAggregateTranslator.java:99-108). Structural nodes first, so a
    ROLLUP reports 'grouping sets' rather than a downstream aggregate
    nit."""
    nodes = list(_iter_plan_nodes(plan))
    for node in nodes:
        name = node.nodeName()
        if name == "Sort":
            raise SqlValidationError("ORDER BY is not supported in Samza SQL")
        if name in ("GlobalLimit", "LocalLimit"):
            raise SqlValidationError("LIMIT is not supported in Samza SQL")
        if name == "Union":
            raise SqlValidationError(
                "UNION is not supported in Samza SQL (use multi-statement fan-in)"
            )
        if name == "Intersect":
            raise SqlValidationError("INTERSECT is not supported in Samza SQL")
        if name == "Except":
            raise SqlValidationError("EXCEPT is not supported in Samza SQL")
        if name == "Window":
            raise SqlValidationError(
                "analytic window functions (OVER) are not supported in Samza SQL"
            )
        if name == "Expand":
            raise SqlValidationError("grouping sets/cube/rollup are not supported")
        if name in ("Distinct", "Deduplicate"):
            raise SqlValidationError(
                "DISTINCT aggregates are not supported in Samza SQL"
            )
        if name == "Join":
            jt = node.joinType().toString()
            if "FullOuter" in jt:
                raise SqlValidationError(
                    "FULL OUTER JOIN is not supported (JoinTranslator.java:69-76)"
                )
            if jt == "Cross":
                raise SqlValidationError("CROSS JOIN is not supported (equi-joins only)")
        if name == "Filter" and node.child().nodeName() == "Aggregate":
            raise SqlValidationError("HAVING is not supported in Samza SQL")
    for node in nodes:
        if node.nodeName() == "Aggregate":
            # one-line node description: grouping + aggregate expressions
            # only. Unaliased aggregates render as `count(1) AS count(1)#5L`
            # — strip alias text so the function call is counted once.
            desc = re.sub(r" AS [^,\]]+", "", node.simpleString(1_000_000))
            if re.search(r"\bcount\(distinct ", desc, re.IGNORECASE):
                raise SqlValidationError(
                    "DISTINCT aggregates are not supported in Samza SQL"
                )
            for fn in ("sum", "avg", "min", "max", "first", "last", "collect_list"):
                if re.search(rf"\b{fn}\(", desc, re.IGNORECASE):
                    # SamzaSqlValidator.java:116-127
                    raise SqlValidationError(
                        f"LogicalAggregate with {fn} function is not supported"
                    )
            n_counts = len(re.findall(r"\bcount\(", desc, re.IGNORECASE))
            if n_counts > 1:
                # LogicalAggregateTranslator.java:99-108 — exactly one agg call
                raise SqlValidationError(
                    "only a single COUNT aggregate call is supported per query"
                )
            if n_counts and node.groupingExpressions().isEmpty():
                raise SqlValidationError("aggregate requires GROUP BY in Samza SQL")


def _validate_text(select_sql: str) -> None:
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
