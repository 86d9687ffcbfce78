"""Job status registry — the samza-rest JobsResource/TasksResource
payload surface (reference: samza-rest model/Job.java:29-47,
JobStatus.java:25-44, model/Task.java:30-46)."""

import json

from samza_spark import status
from samza_spark.config import JobConfig
from samza_spark.jobmodel import build_job_model
from samza_spark.run_app import run_job


def test_record_and_get_roundtrip(tmp_path):
    store = str(tmp_path / "reg")
    status.record_status(store, "j1", "1", status.STARTED)
    j = status.get_job(store, "j1", "1")
    assert j["jobName"] == "j1" and j["status"] == "started"
    assert j["statusDetail"] is None
    assert status.get_job(store, "nope", "1")["status"] == "unknown"


def test_list_jobs_sorted_and_stop_flow(tmp_path):
    store = str(tmp_path / "reg")
    status.record_status(store, "b", "1", status.STARTED)
    status.record_status(store, "a", "1", status.STARTING)
    jobs = status.list_jobs(store)
    assert [j["jobName"] for j in jobs] == ["a", "b"]
    assert not status.stop_requested(store, "b", "1")
    status.request_stop(store, "b", "1")
    assert status.stop_requested(store, "b", "1")


def test_list_tasks_from_job_model(tmp_path):
    props = tmp_path / "j.properties"
    props.write_text(
        "job.name=tjob\n"
        "job.container.count=2\n"
        "task.inputs=mem.in\n"
        "systems.mem.samza.factory=org.apache.samza.system.inmemory.InMemorySystemFactory\n"
    )
    cfg = JobConfig.from_file(str(props))
    model = build_job_model(
        cfg, partition_counts={("mem", "in"): 4}
    )
    tasks = status.list_tasks(model)
    assert len(tasks) == 4
    t0 = tasks[0]
    assert t0["preferredHost"] == "localhost"
    assert t0["partitions"][0]["system"] == "mem"
    assert {t["containerId"] for t in tasks} == {"0", "1"}


def test_run_job_maintains_status_lifecycle(spark, tmp_path):
    staging = str(tmp_path / "stage")
    spark.createDataFrame(
        [(1, "a", 10)], "id long, k string, v long"
    ).write.parquet(f"{staging}/src")
    store = str(tmp_path / "reg")
    props = tmp_path / "job.properties"
    props.write_text(
        "job.name=statjob\n"
        "task.inputs=files.src\n"
        "task.outputs=files.out\n"
        "systems.files.samza.factory=org.apache.samza.system.hdfs.HdfsSystemFactory\n"
        f"systems.files.stagingDirectory={staging}\n"
        f"job.status.dir={store}\n"
        "samza.sql.stmt=INSERT INTO out SELECT k FROM src\n"
    )
    run_job(JobConfig.from_file(str(props)), spark)
    j = status.get_job(store, "statjob", "1")
    assert j["status"] == "stopped"
    assert j["statusDetail"] == status.SUCCESSFUL_FINISH


def test_run_job_records_failure(spark, tmp_path):
    store = str(tmp_path / "reg")
    props = tmp_path / "bad.properties"
    props.write_text(
        "job.name=badjob\n"
        f"job.status.dir={store}\n"
        "task.inputs=files.src\n"
        "systems.files.samza.factory=org.apache.samza.system.hdfs.HdfsSystemFactory\n"
        "systems.files.stagingDirectory=/nonexistent-dir-xyz\n"
        "samza.sql.stmt=INSERT INTO out SELECT * FROM src\n"
    )
    try:
        run_job(JobConfig.from_file(str(props)), spark)
    except Exception:
        pass
    j = status.get_job(store, "badjob", "1")
    assert j["status"] == "stopped"
    assert j["statusDetail"] == status.UNSUCCESSFUL_FINISH


def test_cli_outputs_payloads(tmp_path, capsys):
    store = str(tmp_path / "reg")
    status.record_status(store, "c1", "1", status.STARTED)
    assert status.main(["--store", store, "jobs"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out[0]["jobName"] == "c1"
    assert status.main(["--store", store, "job", "c1"]) == 0
    one = json.loads(capsys.readouterr().out)
    assert one["status"] == "started"


def test_cli_operation_status_and_kill(tmp_path, capsys):
    from samza_spark.run_app import main as run_main

    store = str(tmp_path / "reg")
    props = tmp_path / "s.properties"
    props.write_text(f"job.name=opjob\njob.status.dir={store}\n")
    status.record_status(store, "opjob", "1", status.STARTED)
    assert run_main(["--config-path", str(props), "--operation", "status"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "started"
    assert run_main(["--config-path", str(props), "--operation", "kill"]) == 0
    assert json.loads(capsys.readouterr().out)["status"] == "stopped"
    assert status.stop_requested(store, "opjob", "1")


def test_package_main_dispatch(tmp_path, capsys):
    from samza_spark.__main__ import main as pkg_main

    store = str(tmp_path / "reg")
    status.record_status(store, "mj", "1", status.STARTED)
    assert pkg_main(["status", "--store", store, "jobs"]) == 0
    assert json.loads(capsys.readouterr().out)[0]["jobName"] == "mj"
    assert pkg_main(["--help"]) == 0
    assert pkg_main(["bogus"]) == 2
