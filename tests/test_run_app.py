"""run_app CLI — the run-app.sh / JobRunner analog over .properties
configs (reference: samza-shell run-app.sh + JobRunner.java)."""

import json

import pytest

from samza_spark.config import JobConfig
from samza_spark.run_app import main, run_job


def _write_input(spark, path):
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "a", 30)], "id long, k string, v long"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_sql_job_runs_statements_to_file_sink(spark, tmp_path):
    staging = str(tmp_path / "stage")
    _write_input(spark, f"{staging}/src")
    props = tmp_path / "job.properties"
    props.write_text(
        "job.name=sqljob\n"
        "task.inputs=files.src\n"
        "task.outputs=files.out\n"
        "systems.files.samza.factory=org.apache.samza.system.hdfs.HdfsSystemFactory\n"
        f"systems.files.stagingDirectory={staging}\n"
        "samza.sql.stmt=INSERT INTO out SELECT k, SUM(v) AS total FROM src GROUP BY k\n"
    )
    cfg = JobConfig.from_file(str(props))
    result = run_job(cfg, spark)
    assert result["kind"] == "sql" and result["job"] == "sqljob"
    out = spark.read.parquet(f"{staging}/out")
    got = {(r["k"], r["total"]) for r in out.collect()}
    assert got == {("a", 40), ("b", 20)}
    assert result["outputs"]["files.out"] == 2


# module-level so app.class can import it by path
def word_stats_app(spark, cfg, sources):
    src = sources["files.src"]
    df = src.read(spark).df
    from pyspark.sql import functions as F

    return df.groupBy("k").agg(F.count("*").alias("n"))


def test_app_class_callable_writes_first_output(spark, tmp_path):
    staging = str(tmp_path / "stage2")
    _write_input(spark, f"{staging}/src")
    props = tmp_path / "app.properties"
    props.write_text(
        "job.name=appjob\n"
        "app.class=tests.test_run_app:word_stats_app\n"
        "task.inputs=files.src\n"
        "task.outputs=files.counted\n"
        "systems.files.samza.factory=org.apache.samza.system.hdfs.HdfsSystemFactory\n"
        f"systems.files.stagingDirectory={staging}\n"
    )
    result = run_job(JobConfig.from_file(str(props)), spark)
    assert result["kind"] == "app"
    out = spark.read.parquet(f"{staging}/counted")
    assert {(r["k"], r["n"]) for r in out.collect()} == {("a", 2), ("b", 1)}


def test_cli_overrides_and_output(spark, tmp_path, capsys, monkeypatch):
    # main() builds its own session via get_session; reuse the test one
    import samza_spark.session as session_mod

    monkeypatch.setattr(session_mod, "get_session", lambda *a, **k: spark)
    staging = str(tmp_path / "stage3")
    _write_input(spark, f"{staging}/src")
    props = tmp_path / "cli.properties"
    props.write_text(
        "job.name=clijob\n"
        "task.inputs=files.src\n"
        "task.outputs=files.out\n"
        "systems.files.samza.factory=org.apache.samza.system.hdfs.HdfsSystemFactory\n"
    )
    rc = main(
        [
            "--config-path",
            str(props),
            "--config",
            f"systems.files.stagingDirectory={staging}",
            "--config",
            "samza.sql.stmt=INSERT INTO out SELECT id, v FROM src WHERE v >= 20",
        ]
    )
    assert rc == 0
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["job"] == "clijob" and printed["outputs"]["files.out"] == 2


def test_missing_app_raises(spark, tmp_path):
    props = tmp_path / "none.properties"
    props.write_text("job.name=x\ntask.inputs=\n")
    with pytest.raises(ValueError, match="neither app.class nor samza.sql"):
        run_job(JobConfig.from_file(str(props)), spark)


# module-level for app.class import
def log_tail_app(spark, cfg, sources):
    """Streaming StreamApplication shape: drain the replayable log into
    the output directory with AvailableNow; returns the query handles
    for run_job to await."""
    stream = sources["wal.orders"].read_stream(spark).df
    staging = cfg.props["systems.files.stagingDirectory"]
    q = (
        stream.selectExpr("partition", "offset", "value")
        .writeStream.format("parquet")
        .option("path", f"{staging}/tailed")
        .option("checkpointLocation", f"{staging}/_ck")
        .trigger(availableNow=True)
        .start()
    )
    return [q]


def test_streaming_app_over_samza_log(spark, tmp_path):
    """End-to-end: .properties config -> samza_log DataSource stream ->
    app.class -> parquet out, drained by run_job."""
    from samza_spark.config import JobConfig
    from samza_spark.run_app import run_job
    from samza_spark.sources.log_datasource import append_records

    log_dir = str(tmp_path / "wal" / "orders")
    append_records(log_dir, 0, [("k1", "a", 1000), ("k2", "b", 2000)])
    append_records(log_dir, 1, [("k3", "c", 1500)])
    staging = str(tmp_path / "stage")
    cfg = JobConfig.from_text(
        "job.name=tailjob\n"
        "app.class=tests.test_run_app:log_tail_app\n"
        "task.inputs=wal.orders\n"
        "systems.wal.samza.factory=org.apache.samza.system.SamzaLogSystemFactory\n"
        "systems.wal.samza.offset.default=oldest\n"
        f"systems.wal.stagingDirectory={tmp_path}/wal\n"
        "systems.files.samza.factory=org.apache.samza.system.hdfs.HdfsSystemFactory\n"
        f"systems.files.stagingDirectory={staging}\n"
    )
    result = run_job(cfg, spark)
    assert result["kind"] == "app"
    out = spark.read.parquet(f"{staging}/tailed")
    got = sorted((r["partition"], r["offset"], r["value"]) for r in out.collect())
    assert got == [(0, 0, "a"), (0, 1, "b"), (1, 0, "c")]


# ---------------------------------------------------------------------------
# MetricsSnapshotReporter (metrics.reporters config -> snapshot stream)
# ---------------------------------------------------------------------------


def test_metrics_snapshot_layout_and_blacklist(spark, tmp_path):
    """Snapshot wire layout matches MetricsHeader.java:28-38 keys; the
    blacklist regex drops matching group#name pairs (MetricsConfig.java:46)."""
    from samza_spark.streaming.metrics import metrics_snapshot

    snap = metrics_snapshot(
        None,
        job_name="j",
        job_id="7",
        time_ms=1234,
        reset_time_ms=1000,
        extra_groups={"g1": {"rows": 5, "noisy-gauge": 9}, "g2": {"x": 1}},
    )
    h = snap["header"]
    for key in (
        "job-name", "job-id", "container-name", "exec-env-container-id",
        "source", "version", "samza-version", "host", "time", "reset-time",
    ):
        assert key in h
    assert h["job-name"] == "j" and h["job-id"] == "7"
    assert h["time"] == 1234 and h["reset-time"] == 1000
    assert snap["metrics"]["g1"]["rows"] == 5

    filtered = metrics_snapshot(
        None,
        job_name="j",
        extra_groups={"g1": {"rows": 5, "noisy-gauge": 9}, "g2": {"x": 1}},
        blacklist="noisy|g2#",
    )
    assert filtered["metrics"]["g1"] == {"rows": 5}
    assert "g2" not in filtered["metrics"]


def test_sql_job_emits_metrics_snapshots(spark, tmp_path):
    """metrics.reporters config wires a snapshot stream next to the job's
    other file streams; the job-level snapshot carries output row counts."""
    staging = str(tmp_path / "mstage")
    _write_input(spark, f"{staging}/src")
    props = tmp_path / "mjob.properties"
    props.write_text(
        "job.name=mjob\n"
        "job.id=3\n"
        "task.inputs=files.src\n"
        "task.outputs=files.out\n"
        "systems.files.samza.factory=org.apache.samza.system.hdfs.HdfsSystemFactory\n"
        f"systems.files.stagingDirectory={staging}\n"
        "samza.sql.stmt=INSERT INTO out SELECT k, SUM(v) AS total FROM src GROUP BY k\n"
        "metrics.reporters=snapshot\n"
        "metrics.reporter.snapshot.stream=files.metrics\n"
    )
    result = run_job(JobConfig.from_file(str(props)), spark)
    assert result["metrics_snapshots"] == 1
    snaps = [
        json.loads(p.read_text())
        for p in sorted((tmp_path / "mstage" / "metrics").glob("snapshot-*.json"))
    ]
    assert len(snaps) == 1
    h = snaps[0]["header"]
    assert h["job-name"] == "mjob" and h["job-id"] == "3"
    body = snaps[0]["metrics"]["samza_spark.run_app.JobMetrics"]
    assert body["output-rows-files.out"] == 2
    # the snapshot stream reads back through the normal file-source path
    df = spark.read.json(f"{staging}/metrics")
    assert df.count() == 1


def test_streaming_app_reports_query_metrics(spark, tmp_path):
    """A drained streaming app gets one snapshot per query handle with
    SamzaContainerMetrics.process-envelopes == rows ingested."""
    import samza_spark.streaming.metrics as m

    staging = str(tmp_path / "sstage")
    src_dir = f"{staging}/events_in"
    spark.createDataFrame(
        [(i, f"u{i % 3}") for i in range(50)], "id long, user string"
    ).coalesce(1).write.mode("overwrite").parquet(src_dir)

    rep = m.MetricsSnapshotReporter(
        f"{staging}/metrics", job_name="streamjob", reset_time_ms=5
    )
    q = (
        spark.readStream.schema("id long, user string")
        .parquet(src_dir)
        .writeStream.format("noop")
        .option("checkpointLocation", f"{staging}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snap = rep.report(q)
    grp = snap["metrics"]["org.apache.samza.container.SamzaContainerMetrics"]
    assert grp["process-envelopes"] == 50
    assert snap["metrics"]["samza_spark.streaming.StreamingQueryMetrics"][
        "input_rows"
    ] == 50
    assert rep._seq == 1
