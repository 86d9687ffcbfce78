"""Physical-plan scale advisor: the hazards this repo's own
test_plans.py pins for every headline operator, packaged as a
user-facing audit for *their* DataFrames.

At 100 TB the difference between a plan that works and one that melts
is usually one of a small set of shapes — a cartesian product, a
single-partition exchange under a global window, row-at-a-time Python
in the hot path, a scan that ignores its pushable filters. Samza's
answer was code review of the operator DAG; Spark's analyzed/physical
plan makes the review mechanical.

Usage::

    from samza_spark.advisor import plan_audit
    findings = plan_audit(df)          # [] means no known hazard
    for f in findings:
        print(f["severity"], f["code"], f["detail"])

Detection is string-level over ``explain("formatted")`` (the same
surface the plan regression tests use — each node renders twice there,
tree + details, which the counts below account for).
"""

from __future__ import annotations

import re

__all__ = ["plan_audit", "explain_formatted"]


def explain_formatted(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _finding(code: str, severity: str, detail: str) -> dict:
    return {"code": code, "severity": severity, "detail": detail}


_DETAIL_HEAD_RE = re.compile(r"^\((\d+)\) ([A-Za-z][A-Za-z0-9]*)", re.MULTILINE)
# a tree line: branch-art prefix, node name (first word), trailing "(id)"
_TREE_LINE_RE = re.compile(
    r"^([\s:|+\-*]*)([A-Za-z][A-Za-z0-9]*)(?:[^()\n]*)\((\d+)\)\s*$"
)
# nodes that pass partitioning through unchanged between the Exchange
# and the Window it feeds (AQE inserts AQEShuffleRead/ShuffleQueryStage
# between them at runtime; Sort is the standard window pre-sort)
_PASS_THROUGH = frozenset(
    {"Sort", "AQEShuffleRead", "ShuffleQueryStage", "InputAdapter"}
)


def _count_single_partition_windows(plan: str) -> int:
    """Count Window nodes fed (directly or through pass-through nodes —
    Sort, AQEShuffleRead, ShuffleQueryStage) by an Exchange
    SinglePartition — the shape that serializes the whole input into
    one sorting task.

    Walks the actual indentation tree of the formatted explain instead
    of assuming parent id = child id + 1 (the r9-ADVICE false-negative:
    AQE can insert a node between the Exchange and its Sort/Window, and
    ids are not always consecutive along a branch). The SinglePartition
    argument only appears in the details block of the exchange's id."""
    lines = plan.splitlines()
    # parse only tree sections — detail blocks can contain "name (n)"
    # shaped text (function lists, argument expressions). The main tree
    # runs until the first "(id) Name" detail head; each subquery section
    # ("Subquery:N Hosting operator ...") opens a fresh tree.
    parents: dict[int, int] = {}
    names: dict[int, str] = {}
    stack: "list[tuple[int, int]]" = []  # (name column, node id)
    in_tree = True
    for line in lines:
        if line.startswith("Subquery:") or line.startswith("===== Subqueries"):
            in_tree = True
            stack = []
            continue
        if _DETAIL_HEAD_RE.match(line):
            in_tree = False
            continue
        if not in_tree:
            continue
        m = _TREE_LINE_RE.match(line)
        if not m:
            continue
        col, name, nid = len(m.group(1)), m.group(2), int(m.group(3))
        names[nid] = name
        while stack and stack[-1][0] >= col:
            stack.pop()
        if stack:
            parents[nid] = stack[-1][1]
        stack.append((col, nid))
    # details text per node id (block runs to the next "(id) Name" head)
    heads = list(_DETAIL_HEAD_RE.finditer(plan))
    details = {}
    for k, h in enumerate(heads):
        end = heads[k + 1].start() if k + 1 < len(heads) else len(plan)
        details[int(h.group(1))] = plan[h.start() : end]
    count = 0
    for nid, name in names.items():
        if name != "Exchange":
            continue
        if "SinglePartition" not in details.get(nid, ""):
            continue
        up = parents.get(nid)
        hops = 0
        while up is not None and names.get(up) in _PASS_THROUGH and hops < 8:
            up = parents.get(up)
            hops += 1
        if up is not None and names.get(up) in ("Window", "WindowGroupLimit"):
            count += 1
    return count


def plan_audit(df, expected_filter_pushdown: bool | None = None) -> "list[dict]":
    """Audit one DataFrame's physical plan for known scale hazards.

    Returns a list of findings ``{code, severity, detail}`` —
    empty when none of the known shapes appear. Severities: ``error``
    (will not survive a 100× scale-up), ``warn`` (costs real money but
    may be intentional — e.g. a deliberate one-row broadcast join).

    ``expected_filter_pushdown=True`` adds a check that the scan
    actually received pushed filters (only meaningful when the query
    filters on scannable columns of a v1 file source).
    """
    plan = explain_formatted(df)
    findings: list[dict] = []

    if "CartesianProduct" in plan:
        findings.append(
            _finding(
                "cartesian-product",
                "error",
                "CartesianProduct joins every row with every row; at scale "
                "this is O(n*m) shuffle and compute. Add an equi-join key "
                "(blocking/banding) or broadcast a provably tiny side.",
            )
        )
    if "BatchEvalPython" in plan:
        findings.append(
            _finding(
                "rowwise-python",
                "error",
                "BatchEvalPython is a row-at-a-time Python UDF in the hot "
                "path (~10-100x slower than JVM expressions). Rewrite with "
                "built-in functions, or at minimum an Arrow-batched "
                "pandas_udf / mapInPandas.",
            )
        )
    # formatted mode renders an exchange's partitioning only in its
    # details block ("Arguments: SinglePartition, ..."), once per node
    n_window = _count_single_partition_windows(plan)
    n_single = plan.count("SinglePartition")
    if n_window:
        # promoted to error (r8 verdict #5): a SinglePartition exchange
        # FEEDING a Window/Sort chain is the global-window funnel — one
        # task sorts the whole input; it cannot survive a 100x scale-up
        # unless the table is provably bounded (bins, sketch cells,
        # distinct scores — callers with such tables waive explicitly).
        findings.append(
            _finding(
                "single-partition-window",
                "error",
                f"{n_window} Window over Exchange SinglePartition: the "
                "whole input funnels through ONE task to be sorted. Use "
                "the range-exchange primitives (operators.rank.global_rank "
                "/ global_cumsum) — or waive only if the windowed table is "
                "provably bounded (bin/sketch/distinct-score tables).",
            )
        )
    if n_single:
        findings.append(
            _finding(
                "single-partition-exchange",
                "warn",
                f"{n_single} Exchange SinglePartition node(s): all data "
                "funnels through one task. Fine for a final k-row collect; "
                "fatal under a global Window.orderBy or global sort — use a "
                "range exchange (operators.rank.global_rank) instead.",
            )
        )
    if "BroadcastNestedLoopJoin" in plan:
        if "Join type: Cross" in plan or "Join condition: None" in plan:
            # warn, not error: the one-row scalar-attachment idiom
            # (crossJoin with a global aggregate — totals, centroids,
            # normalization constants) plans exactly like this and is
            # O(n*1); the plan alone cannot prove the broadcast side's
            # cardinality, so the reader must check it.
            findings.append(
                _finding(
                    "cartesian-product",
                    "warn",
                    "Conditionless cross join (BroadcastNestedLoopJoin "
                    "Cross): O(n*m) compute if the broadcast side has m "
                    "rows. Fine ONLY for one-row scalar attachment; "
                    "otherwise add an equi-key.",
                )
            )
        else:
            findings.append(
                _finding(
                    "nested-loop-join",
                    "warn",
                    "BroadcastNestedLoopJoin evaluates its condition per "
                    "row pair. Acceptable only when the broadcast side is "
                    "O(1) rows (scalar attachment); otherwise add an "
                    "equi-key.",
                )
            )
    n_exchange = plan.count("Exchange") // 2
    if n_exchange >= 8:
        findings.append(
            _finding(
                "many-exchanges",
                "warn",
                f"{n_exchange} shuffles in one query. Check for repeated "
                "re-partitioning of the same data — persist a shared "
                "subtree, pre-bucket the tables, or reuse one partitioning "
                "across stages.",
            )
        )
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if m and m.group(1).count(",") + 1 >= 12:
        findings.append(
            _finding(
                "wide-scan",
                "warn",
                f"scan reads {m.group(1).count(',') + 1} columns — if the "
                "query uses only a few, add an explicit select() so column "
                "pruning reaches the reader.",
            )
        )
    if expected_filter_pushdown:
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        if pushed and all(not p.strip() for p in pushed):
            findings.append(
                _finding(
                    "no-filter-pushdown",
                    "warn",
                    "PushedFilters is empty on every scan: the filter is "
                    "evaluated after a full read. Filter on raw columns "
                    "(not expressions over them) or pre-partition by the "
                    "filter column.",
                )
            )
    return findings


# ---------------------------------------------------------------------------
# sketch-driven join-order advice
# ---------------------------------------------------------------------------


def sketch_join_advice(
    edges,
    *,
    depth: int = 4,
    width: int = 256,
    salt: str = "ja0",
    broadcast_threshold_rows: int = 100_000,
):
    """Cost-based join planning advice from count-min sketches — the
    CBO input a 100 TB warehouse derives without scanning twice: for
    each candidate equi-join edge, estimate the output cardinality with
    the one-sided count-min inner product
    (pipeline.sketches.count_min_inner_product, never an underestimate)
    and recommend a strategy + build side from the EXACT input row
    counts.

    ``edges`` is a list of ``(left_name, left_df, left_key, right_name,
    right_df, right_key)``. Returns one row per edge::

        (edge, left_table, right_table, left_rows, right_rows,
         est_join_size, strategy, build_side, join_rank)

    * ``strategy``: 'broadcast' when the smaller input fits the
      threshold (the advisor analog of spark.sql.autoBroadcastJoinThreshold,
      in rows because sketches count rows), else 'shuffle'.
    * ``join_rank``: ascending by estimated output size — the greedy
      "smallest intermediate first" order a left-deep planner consumes
      (Selinger-style heuristic; the estimates being one-sided means an
      edge ranked safe really is safe).

    Cost shape: per table one exact key-count aggregate (the same
    shuffle a COUNT DISTINCT pays) -> constant d×w cell tables; every
    estimate job thereafter is sketch-sized. The final rank window runs
    over n_edges rows — bounded by the QUERY's join graph, not data.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from samza_spark.pipeline import sketches

    row_counts: dict[str, int] = {}
    rows = []
    per_edge = []
    for lname, ldf, lkey, rname, rdf, rkey in edges:
        if lname not in row_counts:
            row_counts[lname] = ldf.count()
        if rname not in row_counts:
            row_counts[rname] = rdf.count()
        sk_l = sketches.count_min_table(ldf, lkey, depth=depth, width=width, salt=salt)
        sk_r = sketches.count_min_table(rdf, rkey, depth=depth, width=width, salt=salt)
        est = sketches.count_min_inner_product(sk_l, sk_r)
        per_edge.append((lname, rname, est))
    for lname, rname, est in per_edge:
        ln, rn = row_counts[lname], row_counts[rname]
        small, big = (lname, rname) if (ln, lname) <= (rn, rname) else (rname, lname)
        rows.append(
            est.select(
                F.lit(f"{lname}|{rname}").alias("edge"),
                F.lit(lname).alias("left_table"),
                F.lit(rname).alias("right_table"),
                F.lit(ln).cast("long").alias("left_rows"),
                F.lit(rn).cast("long").alias("right_rows"),
                F.col("join_size_estimate").cast("long").alias("est_join_size"),
                F.lit(
                    "broadcast"
                    if min(ln, rn) <= broadcast_threshold_rows
                    else "shuffle"
                ).alias("strategy"),
                F.lit(small).alias("build_side"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    w = Window.partitionBy(F.lit(1)).orderBy("est_join_size", "edge")
    return out.withColumn("join_rank", F.row_number().over(w))


# ---------------------------------------------------------------------------
# SQL join-edge extraction (the shell EXPLAIN surface for sketch advice)
# ---------------------------------------------------------------------------

_FROM_ITEM_RE = re.compile(
    r"\b(?:from|join)\s+([A-Za-z_][\w.$]*)(?:\s+(?:as\s+)?"
    r"(?!on\b|join\b|inner\b|left\b|right\b|full\b|cross\b|where\b|group\b"
    r"|order\b|limit\b|having\b|union\b)([A-Za-z_]\w*))?",
    re.IGNORECASE,
)
_ON_EQ_RE = re.compile(
    r"\bjoin\s+([A-Za-z_][\w.$]*)(?:\s+(?:as\s+)?([A-Za-z_]\w*))?\s+on\s+"
    r"\(?\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*\)?",
    re.IGNORECASE,
)


def extract_join_edges(select_sql: str) -> "list[tuple[str, str, str, str]]":
    """Heuristic equi-join edges from a SELECT: each ``JOIN t [alias] ON
    a.k1 = b.k2`` whose single top equality is alias-qualified on both
    sides becomes ``(left_table, left_key, right_table, right_key)``.
    Aliases resolve through the FROM/JOIN item list; anything fancier
    (expression keys, multi-predicate ON, subquery sources) is skipped —
    the advisor surface degrades to plan_audit alone, never guesses."""
    flat = re.sub(r"\s+", " ", select_sql)
    alias_to_table: dict = {}
    for m in _FROM_ITEM_RE.finditer(flat):
        table, alias = m.group(1), m.group(2)
        alias_to_table[(alias or table).lower()] = table
        alias_to_table.setdefault(table.lower(), table)
    edges = []
    for m in _ON_EQ_RE.finditer(flat):
        joined, jalias, lq, lk, rq, rk = m.groups()
        jname = (jalias or joined).lower()
        lt = alias_to_table.get(lq.lower())
        rt = alias_to_table.get(rq.lower())
        if not lt or not rt:
            continue
        # orient so the freshly-joined table is the right side
        if lq.lower() == jname:
            lt, lk, rt, rk = rt, rk, lt, lk
        edges.append((lt, lk, rt, rk))
    return edges


def sql_join_advice(spark, select_sql: str, **kwargs):
    """sketch_join_advice over the equi-join edges of a SQL SELECT whose
    sources are registered views — the EXPLAIN hook. Returns None when
    the statement has no extractable edges."""
    edges = extract_join_edges(select_sql)
    if not edges:
        return None
    triples = []
    for lt, lk, rt, rk in edges:
        triples.append((lt, spark.table(lt), lk, rt, spark.table(rt), rk))
    return sketch_join_advice(triples, **kwargs)
