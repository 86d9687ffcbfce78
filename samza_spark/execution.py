"""Execution plan (``plan.json``) generation — the ExecutionPlanner /
JobGraphJsonGenerator analog.

Reference surface:

* samza-core/.../execution/JobGraphJsonGenerator.java:49-260 — the
  JobGraphJson shape (``jobs`` / ``sourceStreams`` / ``sinkStreams`` /
  ``intermediateStreams`` / ``tables`` / ``applicationName`` /
  ``applicationId``; per-job ``operatorGraph`` with ``inputStreams``,
  ``outputStreams`` and an ``operators`` map of
  ``{opCode, opId, sourceLocation, nextOperatorIds}``).
* samza-core/.../execution/JobPlanner.java:141-154 —
  ``writePlanJsonFile`` puts the JSON at ``$EXECUTION_PLAN_DIR/plan.json``
  (the Samza dashboard's visualization input).
* samza-api/.../operators/spec/OperatorSpec.java:42-57 — the OpCode enum.
* samza-core/.../application/descriptors/StreamApplicationDescriptorImpl.java:164-172
  — opId format ``{appName}-{appId}-{opcode}-{n}``.

Spark-first: the reference walks its OperatorSpecGraph (the DSL's own
node objects). Here the operator graph *is* Spark's analyzed logical
plan, so the generator walks ``df.queryExecution().analyzed()`` via py4j
and maps each Catalyst node onto the nearest Samza OpCode; the raw
Catalyst node name is preserved in ``sourceLocation`` (the field the
reference fills with the user's stack frame — for a declarative plan the
Catalyst node is the authoritative "where this operator came from").
Nothing is executed: plan generation is pure metadata, same as the
reference's planner stage.
"""

from __future__ import annotations

import itertools
import json
import os

__all__ = [
    "operator_graph",
    "execution_plan",
    "write_plan_json",
    "column_lineage",
]

# Catalyst analyzed-plan node name -> Samza OpCode
# (OperatorSpec.java:42-57). Aggregations map to WINDOW: Samza expresses
# every aggregation as a window pane (global batch agg == one
# unbounded pane); Sort/Limit/Window-functions have no Samza opcode and
# degrade to MAP with the precise node kept in sourceLocation.
_OPCODE = {
    "Project": "MAP",
    "Filter": "FILTER",
    "Generate": "FLAT_MAP",
    "Join": "JOIN",
    "Aggregate": "WINDOW",
    "Distinct": "WINDOW",
    "Deduplicate": "WINDOW",
    "DeduplicateWithinWatermark": "WINDOW",
    "EventTimeWatermark": "WINDOW",
    "Union": "MERGE",
    "Repartition": "PARTITION_BY",
    "RepartitionByExpression": "PARTITION_BY",
    "RepartitionOperation": "PARTITION_BY",
    "MapInPandas": "FLAT_MAP",
    "FlatMapGroupsInPandas": "FLAT_MAP",
    "FlatMapGroupsInPandasWithState": "WINDOW",
    "CollectMetrics": "MAP",
    "WriteToMicroBatchDataSource": "SEND_TO",
    "WriteToStream": "SEND_TO",
    "InsertIntoStatement": "SEND_TO",
}

# Leaf relations -> INPUT (not emitted into the operators map;
# JobGraphJsonGenerator.updateOperatorGraphJson:153-156 skips INPUT too).
_INPUT_NODES = {
    "LogicalRelation",
    "LogicalRDD",
    "LocalRelation",
    "Range",
    "StreamingRelation",
    "StreamingRelationV2",
    "StreamingExecutionRelation",
    "StreamingDataSourceV2Relation",
    "StreamingDataSourceV2ScanRelation",
    "DataSourceV2Relation",
    "DataSourceV2ScanRelation",
    "UnresolvedRelation",
    "OneRowRelation",
}

# Transparent wrappers: no operator in the reference model — traverse
# through without emitting a node. (Window FUNCTIONS — OVER clauses —
# and Sort/Limit fall through to the MAP default with the Catalyst node
# name preserved in sourceLocation.)
_SKIP = {"SubqueryAlias", "View", "ResolvedHint", "UnresolvedHint", "WithCTE"}


def _children(jnode) -> list:
    seq = jnode.children()
    return [seq.apply(i) for i in range(seq.length())]


def _relation_hint(jnode) -> str:
    """Best-effort physical name for a leaf relation (file path / table
    identifier / source name) pulled from the node's simpleString."""
    try:
        s = jnode.simpleString(120)
    except Exception:
        s = jnode.nodeName()
    return s[:120]


def operator_graph(df, app_name: str = "app", app_id: str = "1") -> dict:
    """OperatorGraphJson for one DataFrame: walk the analyzed logical
    plan root-down, linking each child to its downstream consumer
    (Samza's ``nextOperatorIds`` point source->sink, i.e. child->parent
    in Catalyst's tree orientation)."""
    jplan = df._jdf.queryExecution().analyzed()
    counter = itertools.count(1)
    input_n = itertools.count(1)
    operators: dict[str, dict] = {}
    input_streams: list[dict] = []

    def visit(node, downstream: str | None) -> None:
        name = node.nodeName()
        if name in _SKIP:
            for c in _children(node):
                visit(c, downstream)
            return
        kids = _children(node)
        if name in _INPUT_NODES or not kids:
            input_streams.append(
                {
                    "streamId": f"input-{next(input_n)}",
                    "relation": _relation_hint(node),
                    "nextOperatorIds": [downstream] if downstream else [],
                }
            )
            return
        op_code = _OPCODE.get(name, "MAP")
        op_id = (
            f"{app_name}-{app_id}-{op_code.lower().replace('_', '-')}"
            f"-{next(counter)}"
        )
        operators[op_id] = {
            "opCode": op_code,
            "opId": op_id,
            "sourceLocation": name,
            "nextOperatorIds": [downstream] if downstream else [],
        }
        for c in kids:
            visit(c, op_id)

    visit(jplan, None)
    return {
        "inputStreams": input_streams,
        "outputStreams": [],
        "operators": operators,
    }


def _partition_count(cfg, system: str, stream: str) -> int:
    """StreamEdge partition count (JobGraphJsonGenerator.StreamSpecJson
    ``partitionCount``): explicit config first, then a probe of the
    physical stream (samza_log manifest / file count), else 1."""
    p = cfg.props.get(f"streams.{stream}.samza.partitions")
    if p:
        return int(p)
    root = cfg.props.get(f"systems.{system}.stagingDirectory", "")
    path = f"{root.rstrip('/')}/{stream}" if root else stream
    try:
        kind = cfg.system_kind(system)
    except ValueError:
        kind = "file"
    if kind == "samzalog":
        from samza_spark.sources.log_datasource import read_manifest

        return max(1, len(read_manifest(path)))
    if os.path.isdir(path):
        n = sum(
            1
            for f in os.listdir(path)
            if not f.startswith(("_", "."))
        )
        return max(1, n)
    return 1


def _stream_edge(cfg, system: str, stream: str, job_name: str, role: str) -> dict:
    root = cfg.props.get(f"systems.{system}.stagingDirectory", "")
    physical = f"{root.rstrip('/')}/{stream}" if root else stream
    return {
        "streamSpec": {
            "id": stream,
            "systemName": system,
            "physicalName": physical,
            "partitionCount": _partition_count(cfg, system, stream),
        },
        "sourceJobs": [job_name] if role == "sink" else [],
        "targetJobs": [job_name] if role == "source" else [],
    }


def execution_plan(cfg, df=None) -> dict:
    """Full JobGraphJson for one job config (JobGraphJsonGenerator.toJson
    shape). ``df`` (optional) supplies the operator graph — the final
    DataFrame of the app, walked as the OperatorSpecGraph analog."""
    app_name = cfg.props.get("app.name", cfg.job_name)
    app_id = cfg.props.get("app.id", cfg.props.get("job.id", "1"))
    job_name = cfg.job_name
    op_graph = (
        operator_graph(df, app_name, app_id)
        if df is not None
        else {"inputStreams": [], "outputStreams": [], "operators": {}}
    )
    source_streams = {
        stream: _stream_edge(cfg, system, stream, job_name, "source")
        for system, stream in cfg.task_inputs()
    }
    sink_streams = {
        stream: _stream_edge(cfg, system, stream, job_name, "sink")
        for system, stream in cfg.task_outputs()
    }
    op_graph["outputStreams"] = [
        {"streamId": s, "nextOperatorIds": []} for s in sink_streams
    ]
    # intermediate streams: every PARTITION_BY operator repartitions
    # through an intermediate stream named after its opId
    # (PartitionByOperatorSpec -> intermediate StreamEdge in the
    # reference's JobGraph). Partition count = the shuffle parallelism.
    shuffle_n = int(cfg.props.get("job.container.count", "0")) or None
    intermediate = {}
    for op_id, op in op_graph["operators"].items():
        if op["opCode"] != "PARTITION_BY":
            continue
        intermediate[op_id] = {
            "streamSpec": {
                "id": op_id,
                "systemName": cfg.props.get("job.default.system", "intermediate"),
                "physicalName": op_id,
                "partitionCount": shuffle_n or -1,
            },
            "sourceJobs": [job_name],
            "targetJobs": [job_name],
        }
    tables = {
        name: {
            "id": name,
            "providerFactory": cfg.props.get(
                f"stores.{name}.factory",
                "samza_spark.tables.local.DurableLocalTable",
            ),
        }
        for name in cfg.store_names()
    }
    return {
        "jobs": [
            {
                "jobName": job_name,
                "jobId": cfg.props.get("job.id", "1"),
                "operatorGraph": op_graph,
            }
        ],
        "sourceStreams": source_streams,
        "sinkStreams": sink_streams,
        "intermediateStreams": intermediate,
        "tables": tables,
        "applicationName": app_name,
        "applicationId": app_id,
    }


def write_plan_json(plan: dict, plan_dir: str) -> str:
    """JobPlanner.writePlanJsonFile analog: ``{plan_dir}/plan.json``
    (created if needed), single JSON document, returns the path."""
    os.makedirs(plan_dir, exist_ok=True)
    path = os.path.join(plan_dir, "plan.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(plan, f, indent=2, sort_keys=True)
    os.replace(tmp, path)
    return path


def _seq(jseq) -> list:
    return [jseq.apply(i) for i in range(jseq.length())]


def column_lineage(df) -> dict:
    """Column-level lineage from the analyzed logical plan — which leaf
    relation columns each output column is derived from.

    The reference has no lineage surface (governance lives outside
    Samza); at 100 TB a curation DAG needs one — "which raw inputs feed
    this exported column" is the audit question behind every
    decontamination / PII attestation. Spark's analyzed plan already
    carries the answer in its expression graph: every Alias / aggregate
    / window expression names its references by globally-unique exprId,
    so lineage is one metadata walk — no job runs, nothing is executed.

    Returns ``{"columns": {out_col: [sorted "inN.col" refs]},
    "relations": {"inN": relation description}}``. Duplicate output
    names are disambiguated as ``name#2``, ``name#3``, ...
    """
    jplan = df._jdf.queryExecution().analyzed()
    id2src: dict[int, set] = {}
    relations: dict[str, str] = {}
    leaf_n = itertools.count(1)

    def refs_srcs(ne) -> set:
        out: set = set()
        for at in _seq(ne.references().toSeq()):
            out |= id2src.get(at.exprId().id(), set())
        return out

    def register(ne) -> None:
        eid = ne.exprId().id()
        if eid not in id2src:
            id2src[eid] = refs_srcs(ne)

    def visit(node) -> None:
        kids = _children(node)
        for c in kids:
            visit(c)
        if not kids:  # leaf relation
            tag = f"in{next(leaf_n)}"
            relations[tag] = _relation_hint(node)
            for at in _seq(node.output()):
                id2src[at.exprId().id()] = {f"{tag}.{at.name()}"}
            return
        name = node.nodeName()
        if name in ("Union", "Intersect", "Except"):
            # output reuses the first child's exprIds; fold every
            # branch's positional column into the same lineage set
            outs = _seq(node.output())
            for i, at in enumerate(outs):
                srcs: set = set()
                for c in kids:
                    c_out = _seq(c.output())
                    if i < len(c_out):
                        srcs |= id2src.get(c_out[i].exprId().id(), set())
                id2src[at.exprId().id()] = srcs
            return
        for meth in ("projectList", "aggregateExpressions", "windowExpressions"):
            try:
                for ne in _seq(getattr(node, meth)()):
                    register(ne)
            except Exception:
                continue
        if name == "Generate":
            try:
                gen_srcs: set = set()
                for at in _seq(node.generator().references().toSeq()):
                    gen_srcs |= id2src.get(at.exprId().id(), set())
                for at in _seq(node.generatorOutput()):
                    id2src.setdefault(at.exprId().id(), gen_srcs)
            except Exception:
                pass
        # conservative fallback: an output attribute this walk didn't
        # resolve inherits everything its children expose
        all_child: set = set()
        unresolved = [
            at for at in _seq(node.output()) if at.exprId().id() not in id2src
        ]
        if unresolved:
            for c in kids:
                for at in _seq(c.output()):
                    all_child |= id2src.get(at.exprId().id(), set())
            for at in unresolved:
                id2src[at.exprId().id()] = all_child

    visit(jplan)
    columns: dict[str, list] = {}
    for at in _seq(jplan.output()):
        key = at.name()
        n = 2
        while key in columns:
            key = f"{at.name()}#{n}"
            n += 1
        columns[key] = sorted(id2src.get(at.exprId().id(), set()))
    return {"columns": columns, "relations": relations}
