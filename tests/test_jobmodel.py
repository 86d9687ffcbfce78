"""JobModel construction: SSP groupers + task placement
(reference: JobModel/ContainerModel/TaskModel.java, GroupByPartition.java,
GroupBySystemStreamPartition.java, GroupByContainerCount.java)."""

from samza_spark.config import JobConfig
from samza_spark.jobmodel import (
    all_ssps_to_single_task,
    assign_rendezvous,
    assign_round_robin,
    build_job_model,
    group_by_partition,
    group_by_ssp,
    job_model_json,
    ssp,
)


def _ssps():
    return [
        ssp("kafka", "orders", 0), ssp("kafka", "orders", 1),
        ssp("kafka", "users", 0), ssp("kafka", "users", 1),
    ]


def test_group_by_partition_co_partitions_streams():
    tasks = group_by_partition(_ssps())
    assert set(tasks) == {"Partition 0", "Partition 1"}
    assert {(s["stream"], s["partition"]) for s in tasks["Partition 0"]} == {
        ("orders", 0), ("users", 0),
    }


def test_group_by_partition_broadcast_joins_every_task():
    b = ssp("kafka", "config", 0)
    tasks = group_by_partition(_ssps() + [b], broadcast=[b])
    for name in ("Partition 0", "Partition 1"):
        assert b in tasks[name]


def test_group_by_partition_elasticity_buckets():
    tasks = group_by_partition(_ssps(), elasticity_factor=2)
    assert set(tasks) == {
        "Partition 0 0", "Partition 0 1", "Partition 1 0", "Partition 1 1",
    }
    assert all(s["keyBucket"] in (0, 1) for s in tasks["Partition 0 1"])


def test_group_by_ssp_and_single_task():
    per = group_by_ssp(_ssps())
    assert len(per) == 4
    assert "SystemStreamPartition [kafka, orders, 0]" in per
    single = all_ssps_to_single_task(_ssps())
    assert list(single) == ["Task-0"] and len(single["Task-0"]) == 4


def test_round_robin_balanced_rendezvous_minimal_movement():
    names = [f"Partition {i}" for i in range(100)]
    rr = assign_round_robin(names, 4)
    sizes = sorted(sum(1 for v in rr.values() if v == str(c)) for c in range(4))
    assert sizes == [25, 25, 25, 25]
    # round-robin reshuffles nearly everything on N -> N+1 ...
    rr5 = assign_round_robin(names, 5)
    moved_rr = sum(1 for t in names if rr[t] != rr5[t])
    # ... rendezvous moves about 1/(N+1) of tasks
    rv4, rv5 = assign_rendezvous(names, 4), assign_rendezvous(names, 5)
    moved_rv = sum(1 for t in names if rv4[t] != rv5[t])
    assert moved_rv < moved_rr
    assert moved_rv <= 40  # ~20 expected at 1/5
    # moved tasks all moved TO the new container (never between old ones)
    assert all(rv5[t] == "4" for t in names if rv4[t] != rv5[t])


def test_build_job_model_from_properties(tmp_path):
    from samza_spark.sources.log_datasource import append_records

    staging = tmp_path / "stage"
    log = staging / "clicks"
    append_records(str(log), 0, [("a", "1", 1)])
    append_records(str(log), 1, [("b", "2", 2)])
    append_records(str(log), 2, [("c", "3", 3)])
    props = tmp_path / "job.properties"
    props.write_text(
        "job.name=modeljob\n"
        "job.container.count=2\n"
        "task.inputs=logsys.clicks\n"
        "systems.logsys.samza.factory=samza_spark.sources.SamzaLogSystemFactory\n"
        f"systems.logsys.stagingDirectory={staging}\n"
    )
    cfg = JobConfig.from_file(str(props))
    model = build_job_model(cfg)
    assert model["job-name"] == "modeljob"
    assert set(model["containers"]) == {"0", "1"}
    all_tasks = {}
    for c in model["containers"].values():
        all_tasks.update(c["tasks"])
    assert set(all_tasks) == {"Partition 0", "Partition 1", "Partition 2"}
    # changelog partitions are the sorted-task index, unique and stable
    clp = sorted(t["changelog-partition"] for t in all_tasks.values())
    assert clp == [0, 1, 2]
    # stable serialized form
    assert job_model_json(model) == job_model_json(build_job_model(cfg))


def test_model_persistence_and_rebalance_diff(tmp_path):
    """Locality story: persist the model, grow the container count, and
    the rendezvous rebalance moves only ~1/(N+1) of tasks — every moved
    task being one changelog state-restore the diff makes visible."""
    from samza_spark.jobmodel import (
        build_job_model, diff_job_models, load_job_model, save_job_model,
    )

    class _Cfg:
        job_name = "j"
        props = {"job.container.count": "4"}

        @staticmethod
        def task_inputs():
            return [("s", "t")]

        @staticmethod
        def system_kind(system):
            return "file"

    old = build_job_model(
        _Cfg, partition_counts={("s", "t"): 64}, assigner="rendezvous"
    )
    path = str(tmp_path / "jobmodel.json")
    save_job_model(old, path)
    assert load_job_model(path) == old

    new = build_job_model(
        _Cfg, n_containers=5,
        partition_counts={("s", "t"): 64}, assigner="rendezvous",
    )
    d = diff_job_models(old, new)
    assert d["n_tasks"] == 64 and not d["added"] and not d["removed"]
    # ~1/5 expected; generous bound, and every move targets container 4
    assert 0 < d["n_moved"] <= 26
    new_place = {
        t: cid for cid, c in new["containers"].items() for t in c["tasks"]
    }
    assert all(new_place[t] == "4" for t in d["moved"])
    assert d["moved_ppm"] == (1_000_000 * d["n_moved"]) // 64


def _model(assign):
    # assign: {container: [task names]}
    return {
        "job-name": "j",
        "containers": {
            cid: {
                "id": cid,
                "tasks": {
                    t: {
                        "task-name": t,
                        "system-stream-partitions": [],
                        "changelog-partition": i,
                        "task-mode": "Active",
                    }
                    for i, t in enumerate(tasks)
                },
            }
            for cid, tasks in assign.items()
        },
    }


def test_rebalance_scale_down_moves_only_removed_containers_tasks():
    from samza_spark.jobmodel import diff_job_models, rebalance

    old = _model({"0": ["t0", "t1"], "1": ["t2", "t3"], "2": ["t4", "t5"]})
    new = rebalance(old, 2)
    d = diff_job_models(old, new)
    # only the two tasks from container 2 moved
    assert set(d["moved"]) == {"t4", "t5"}
    # balanced within the ceiling
    sizes = sorted(len(c["tasks"]) for c in new["containers"].values())
    assert sizes == [3, 3]


def test_rebalance_scale_up_moves_minimum():
    from samza_spark.jobmodel import diff_job_models, rebalance

    old = _model({"0": ["t0", "t1", "t2"], "1": ["t3", "t4", "t5"]})
    new = rebalance(old, 3)
    d = diff_job_models(old, new)
    # 6 tasks over 3 containers -> ceiling 2: exactly one task leaves
    # each old container
    assert d["n_moved"] == 2
    sizes = sorted(len(c["tasks"]) for c in new["containers"].values())
    assert sizes == [2, 2, 2]


def test_rebalance_preserves_changelog_partitions():
    from samza_spark.jobmodel import rebalance

    old = _model({"0": ["a", "b"], "1": ["c"]})
    clog = {
        t: spec["changelog-partition"]
        for c in old["containers"].values()
        for t, spec in c["tasks"].items()
    }
    new = rebalance(old, 1)
    for c in new["containers"].values():
        for t, spec in c["tasks"].items():
            assert spec["changelog-partition"] == clog[t]


def test_rebalance_same_count_is_noop():
    from samza_spark.jobmodel import diff_job_models, rebalance

    old = _model({"0": ["t0", "t1"], "1": ["t2"]})
    assert diff_job_models(old, rebalance(old, 2))["n_moved"] == 0
