"""JobModel construction: SSP grouping + task-to-container placement.

Reference parity: the coordinator turns a job config into a JobModel —
``container id -> ContainerModel(tasks) -> TaskModel(task name, SSPs,
changelog partition)`` (samza-api/.../job/model/JobModel.java,
ContainerModel.java, TaskModel.java; built by JobModelManager). Two
pluggable layers feed it:

* **SSPGrouper** — which SystemStreamPartitions form one task:
  - :func:`group_by_partition` (GroupByPartition.java:38-75): all SSPs
    with partition N across every input stream -> task ``Partition N``
    (the co-partitioned-join grouping); with ``elasticity_factor`` > 1,
    ``Partition N Y`` key-bucket tasks, one per bucket. Broadcast SSPs
    are added to every task at the end.
  - :func:`group_by_ssp` (GroupBySystemStreamPartition.java): one task
    per SSP, named with the SSP's canonical string.
  - :func:`all_ssps_to_single_task` (AllSspToSingleTaskGrouperFactory):
    every SSP in one task per processor.
* **TaskNameGrouper** — which container runs each task:
  - :func:`assign_round_robin` (GroupByContainerCount.java:46: sorted
    task names dealt over N containers) — balanced but unstable across
    container-count changes.
  - rendezvous placement via
    :func:`samza_spark.operators.assignment.rendezvous_assign_py` —
    same balance, minimal movement (the property the reference recovers
    separately with TaskAssignmentManager + locality persistence).

Changelog partitions are assigned by sorted-task index, exactly how the
coordinator keeps them sticky per task name (JobModelManager).

Everything here is coordinator-side metadata — vocabulary-sized, pure
Python, no Spark job. The model serializes to the same JSON nesting the
reference's samza-rest JobsResource returns.
"""

from __future__ import annotations

import hashlib
import json

SSP_FMT = "SystemStreamPartition [{system}, {stream}, {partition}]"


def ssp(system: str, stream: str, partition: int) -> dict:
    """One SystemStreamPartition as a plain dict."""
    return {"system": system, "stream": stream, "partition": int(partition)}


def _ssp_key(s: dict) -> tuple:
    return (s["system"], s["stream"], s["partition"])


def group_by_partition(
    ssps: "list[dict]",
    broadcast: "list[dict] | None" = None,
    elasticity_factor: int = 1,
) -> "dict[str, list[dict]]":
    """GroupByPartition: task ``Partition N`` owns partition N of every
    input stream (co-partitioned joins); key-bucket tasks when elastic."""
    broadcast = broadcast or []
    bkeys = {_ssp_key(b) for b in broadcast}
    out: dict[str, list] = {}
    for s in sorted(ssps, key=_ssp_key):
        if _ssp_key(s) in bkeys:
            continue
        for bucket in range(elasticity_factor):
            if elasticity_factor == 1:
                name = f"Partition {s['partition']}"
                entry = dict(s)
            else:
                name = f"Partition {s['partition']} {bucket}"
                entry = dict(s, keyBucket=bucket)
            out.setdefault(name, []).append(entry)
    for name in out:
        out[name].extend(dict(b) for b in sorted(broadcast, key=_ssp_key))
    return out


def group_by_ssp(ssps: "list[dict]") -> "dict[str, list[dict]]":
    """GroupBySystemStreamPartition: maximum parallelism, one task/SSP."""
    return {
        SSP_FMT.format(**s): [dict(s)] for s in sorted(ssps, key=_ssp_key)
    }


def all_ssps_to_single_task(ssps: "list[dict]") -> "dict[str, list[dict]]":
    """AllSspToSingleTaskGrouper: one task consumes everything."""
    return {"Task-0": [dict(s) for s in sorted(ssps, key=_ssp_key)]}


def assign_round_robin(task_names: "list[str]", n_containers: int) -> "dict[str, str]":
    """GroupByContainerCount: sorted task names dealt round-robin."""
    return {
        t: str(i % n_containers) for i, t in enumerate(sorted(task_names))
    }


def assign_rendezvous(task_names: "list[str]", n_containers: int) -> "dict[str, str]":
    """Highest-random-weight placement (same scoring as the distributed
    :func:`samza_spark.operators.assignment.rendezvous_assign`): adding a
    container moves only ~1/(N+1) of tasks."""
    out = {}
    for t in task_names:
        best = max(
            range(n_containers),
            key=lambda c: hashlib.md5(f"{t}|container_{c}".encode()).hexdigest(),
        )
        out[t] = str(best)
    return out


_ASSIGNERS = {"round_robin": assign_round_robin, "rendezvous": assign_rendezvous}
_GROUPERS = {
    "GroupByPartition": group_by_partition,
    "GroupBySystemStreamPartition": lambda ssps, **_: group_by_ssp(ssps),
    "AllSspToSingleTask": lambda ssps, **_: all_ssps_to_single_task(ssps),
}


def build_job_model(
    cfg,
    n_containers: "int | None" = None,
    partition_counts: "dict[tuple[str, str], int] | None" = None,
    assigner: str = "round_robin",
) -> dict:
    """Config -> JobModel dict (the JobModelManager path).

    ``partition_counts`` maps (system, stream) -> partition count; when
    omitted, samza_log inputs are probed through their manifest (the
    StreamMetadataCache role) and file inputs count as one partition.
    The grouper comes from ``job.systemstreampartition.grouper.factory``
    (class-name suffix), the container count from ``job.container.count``
    unless overridden, matching the reference's config keys.
    """
    from samza_spark.sources.log_datasource import read_manifest

    if n_containers is None:
        n_containers = int(cfg.props.get("job.container.count", "1"))
    grouper_factory = cfg.props.get(
        "job.systemstreampartition.grouper.factory",
        "org.apache.samza.container.grouper.stream.GroupByPartitionFactory",
    )
    gname = grouper_factory.rsplit(".", 1)[-1].removesuffix("Factory")
    grouper = _GROUPERS.get(gname)
    if grouper is None:
        raise ValueError(f"unsupported SSP grouper {grouper_factory!r}")

    ssps = []
    for system, stream in cfg.task_inputs():
        if partition_counts and (system, stream) in partition_counts:
            n = partition_counts[(system, stream)]
        elif cfg.system_kind(system) == "samzalog":
            root = cfg.props.get(f"systems.{system}.stagingDirectory", "")
            path = f"{root.rstrip('/')}/{stream}" if root else stream
            n = max(len(read_manifest(path)), 1)
        else:
            n = 1
        ssps.extend(ssp(system, stream, p) for p in range(n))

    ef = int(cfg.props.get("job.elasticity.factor", "1"))
    tasks = grouper(ssps, elasticity_factor=ef) if gname == "GroupByPartition" else grouper(ssps)
    placement = _ASSIGNERS[assigner](list(tasks), n_containers)

    containers: dict[str, dict] = {
        str(c): {"id": str(c), "tasks": {}} for c in range(n_containers)
    }
    for idx, name in enumerate(sorted(tasks)):
        containers[placement[name]]["tasks"][name] = {
            "task-name": name,
            "system-stream-partitions": tasks[name],
            "changelog-partition": idx,
            "task-mode": "Active",
        }
    return {"job-name": cfg.job_name, "containers": containers}


def job_model_json(model: dict) -> str:
    """Stable serialized form (sorted keys) for storage/diffing."""
    return json.dumps(model, sort_keys=True, separators=(",", ":"))


def save_job_model(model: dict, path: str) -> None:
    """Persist a JobModel (the coordinator's metadata-store role:
    the reference keeps the previous assignment in the coordinator
    stream via TaskAssignmentManager / LocalityManager so restarts can
    minimize state restores). Atomic rename."""
    import os

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(job_model_json(model))
    os.replace(tmp, path)


def load_job_model(path: str) -> "dict | None":
    try:
        with open(path) as f:
            return json.loads(f.read())
    except FileNotFoundError:
        return None


def diff_job_models(old: dict, new: dict) -> dict:
    """Movement audit between two JobModels — what a rebalance costs.

    Every moved task means a full state restore from the changelog on
    its new container (the exact cost LocalityManager/host-affinity
    exists to avoid). Returns per-task placements, the moved set, and
    counts; ``moved_ppm`` is integer parts-per-million for cross-engine
    comparability with the distributed
    :func:`samza_spark.operators.assignment.assignment_movement`.
    """

    def placements(model: dict) -> "dict[str, str]":
        out = {}
        for cid, c in model["containers"].items():
            for t in c["tasks"]:
                out[t] = cid
        return out

    p_old, p_new = placements(old), placements(new)
    common = sorted(set(p_old) & set(p_new))
    moved = [t for t in common if p_old[t] != p_new[t]]
    return {
        "n_tasks": len(common),
        "n_moved": len(moved),
        "moved_ppm": (1_000_000 * len(moved)) // len(common) if common else 0,
        "moved": moved,
        "added": sorted(set(p_new) - set(p_old)),
        "removed": sorted(set(p_old) - set(p_new)),
    }


def rebalance(model: dict, n_containers: int) -> dict:
    """Sticky minimal-movement rebalance — the host-affinity behavior
    (reference: LocalityManager + TaskAssignmentManager keep each task's
    previous placement in the coordinator stream precisely so a
    container-count change does NOT reshuffle every task; every moved
    task pays a full changelog state restore).

    Rules, deterministic and movement-minimal to the ±1 balance target:

    * tasks on surviving containers stay put unless their container is
      above the balance ceiling;
    * tasks from removed containers, plus overflow tasks (name-sorted,
      taken from the most-loaded containers), fill the least-loaded
      containers (ties by container id).

    Returns a new JobModel; per-task changelog partitions are preserved
    verbatim (they key the durable state — a rebalance must never
    remap them).
    """
    placements: dict[str, str] = {}
    task_specs: dict[str, dict] = {}
    for cid, cont in model["containers"].items():
        for tname, t in cont["tasks"].items():
            placements[tname] = cid
            task_specs[tname] = t
    n_tasks = len(task_specs)
    ceiling = -(-n_tasks // n_containers) if n_containers else 0
    new_ids = [str(c) for c in range(n_containers)]
    load = {cid: 0 for cid in new_ids}
    keep: dict[str, str] = {}
    for tname in sorted(placements):
        cid = placements[tname]
        if cid in load and load[cid] < ceiling:
            keep[tname] = cid
            load[cid] += 1
    homeless = sorted(t for t in task_specs if t not in keep)
    for tname in homeless:
        target = min(new_ids, key=lambda c: (load[c], int(c)))
        keep[tname] = target
        load[target] += 1
    containers = {cid: {"id": cid, "tasks": {}} for cid in new_ids}
    for tname, cid in keep.items():
        containers[cid]["tasks"][tname] = task_specs[tname]
    return {"job-name": model.get("job-name"), "containers": containers}
