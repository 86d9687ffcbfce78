"""``run-app.sh`` / JobRunner analog: launch a job from a Samza
``.properties`` config.

Reference: the reference deploys with ``bin/run-app.sh
--config-path=/path/job.properties [--config k=v ...]`` (docs/startup;
samza-shell/src/main/bash/run-app.sh), where the config names the
application (``app.class``), its inputs (``task.inputs``), systems, and
stores; JobRunner materializes the config and starts the
StreamApplication (samza-core/.../job/JobRunner.java,
ApplicationRunnerMain.java).

Spark-native equivalent: ``python -m samza_spark.run_app
--config-path job.properties [--config k=v ...]`` builds a SparkSession,
resolves ``task.inputs`` through :class:`samza_spark.config.JobConfig`
(the existing .properties compatibility layer), and dispatches on the
app kind:

* ``app.class = pkg.module:callable`` — the StreamApplication analog: a
  Python callable invoked as ``app(spark, config, sources)`` where
  ``sources`` maps ``"system.stream"`` to the built source descriptors.
  It may return None (drove everything itself), a DataFrame (written to
  the first ``task.outputs`` file sink, or displayed), or a list of
  StreamingQuery handles (awaited until drained).
* ``samza.sql.stmt`` / ``samza.sql.stmts`` — the SamzaSqlApplication
  analog (SamzaSqlApplicationConfig.java CFG_SQL_STMT): each input
  stream is registered as a view under its stream name, INSERT INTO
  targets resolve to file sinks under the output system's
  ``stagingDirectory``, and the statements run through
  :class:`samza_spark.sql.runner.SqlApplication` (compat validation
  included).

Only ``--operation run`` is supported (kill/status are YARN-RM calls in
the reference; Spark local mode has no job server to query).
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys

from samza_spark.config import JobConfig


def _load_app(spec: str):
    """Resolve ``pkg.module:callable``."""
    mod_name, _, attr = spec.partition(":")
    if not attr:
        raise ValueError(
            f"app.class {spec!r} must be 'module:callable' "
            "(the Python analog of a StreamApplication class name)"
        )
    mod = importlib.import_module(mod_name)
    return getattr(mod, attr)


def _output_sink(cfg: JobConfig):
    """First ``task.outputs`` entry as a sink descriptor: samza_log
    systems get the transactional log producer, everything else a
    FileSink (the outputs this CLI can complete without a broker)."""
    from samza_spark.sources.descriptors import FileSink, SamzaLogSink

    outs = cfg.task_outputs()
    if not outs:
        return None, None
    system, stream = outs[0]
    root = cfg.props.get(f"systems.{system}.stagingDirectory", "")
    path = f"{root.rstrip('/')}/{stream}" if root else stream
    try:
        kind = cfg.system_kind(system)
    except ValueError:
        kind = "file"
    if kind == "samzalog":
        n = int(cfg.props.get(f"streams.{stream}.samza.partitions", "4"))
        return (
            SamzaLogSink(path, sink_id=cfg.job_name, n_partitions=n),
            f"{system}.{stream}",
        )
    fmt = cfg.props.get(f"streams.{stream}.samza.format", "parquet")
    return FileSink(path, fmt=fmt), f"{system}.{stream}"


def _metrics_reporters(cfg: JobConfig) -> list:
    """Build the configured MetricsSnapshotReporters
    (MetricsConfig.java:33,42,46: ``metrics.reporters`` names each
    reporter; ``metrics.reporter.<name>.stream`` is ``system.stream``;
    ``metrics.reporter.<name>.blacklist`` is the exclusion regex). The
    stream resolves to a directory under the system's stagingDirectory,
    same as every other file-backed stream this runner writes."""
    from samza_spark.streaming.metrics import MetricsSnapshotReporter

    reporters = []
    names = [
        n.strip()
        for n in cfg.props.get("metrics.reporters", "").split(",")
        if n.strip()
    ]
    for name in names:
        spec = cfg.props.get(f"metrics.reporter.{name}.stream")
        if not spec:
            continue
        system, _, stream = spec.partition(".")
        root = cfg.props.get(f"systems.{system}.stagingDirectory", "")
        path = f"{root.rstrip('/')}/{stream}" if root else stream
        reporters.append(
            MetricsSnapshotReporter(
                path,
                job_name=cfg.job_name,
                job_id=cfg.props.get("job.id", "1"),
                blacklist=cfg.props.get(f"metrics.reporter.{name}.blacklist"),
            )
        )
    return reporters


def run_job(cfg: JobConfig, spark=None) -> dict:
    """Run one job config to completion. Returns a small result dict
    (job name, app kind, per-output row counts where knowable)."""
    from samza_spark.config import apply_rewriters

    cfg = apply_rewriters(cfg)  # JobRunner rewrites before submitting
    if spark is None:
        from samza_spark.session import get_session

        spark = get_session()
    result = {"job": cfg.job_name, "outputs": {}}
    reporters = _metrics_reporters(cfg)
    # ExecutionPlan visualization (JobPlanner.writePlanJsonFile:141-154:
    # $EXECUTION_PLAN_DIR/plan.json). Config-level plan up-front; if the
    # app yields a DataFrame the plan is rewritten with its operator
    # graph filled in (the OperatorSpecGraph analog).
    plan_dir = cfg.props.get("job.plan.dir") or os.environ.get("EXECUTION_PLAN_DIR")

    def _write_plan(df=None):
        if not plan_dir:
            return
        from samza_spark.execution import execution_plan, write_plan_json

        try:
            result["plan"] = write_plan_json(execution_plan(cfg, df), plan_dir)
        except Exception as e:  # plan output must never fail the job
            result["plan_error"] = str(e)

    _write_plan()
    # Status registry (samza-rest JobsResource payload; see status.py):
    # starting -> started around the run, stopped + ApplicationStatus
    # detail on the way out (including the failure path).
    status_dir = cfg.props.get("job.status.dir") or os.environ.get(
        "SAMZA_SPARK_STATUS_DIR"
    )
    job_id = cfg.props.get("job.id", "1")
    if status_dir:
        from samza_spark import status as jstatus

        jstatus.record_status(status_dir, cfg.job_name, job_id, jstatus.STARTING)

    def _finish(ok: bool) -> None:
        if status_dir:
            jstatus.record_status(
                status_dir,
                cfg.job_name,
                job_id,
                jstatus.STOPPED,
                jstatus.SUCCESSFUL_FINISH if ok else jstatus.UNSUCCESSFUL_FINISH,
            )

    try:
        out = _run_job_body(cfg, spark, result, reporters, _write_plan, status_dir, job_id)
    except BaseException:
        _finish(False)
        raise
    _finish(True)
    return out


def _run_job_body(cfg, spark, result, reporters, _write_plan, status_dir, job_id):
    if status_dir:
        from samza_spark import status as jstatus

        jstatus.record_status(status_dir, cfg.job_name, job_id, jstatus.STARTED)

    def _emit_metrics(queries=()):
        """One snapshot per drained query handle plus one job-level
        snapshot carrying output row counts (the JobRunner-side summary
        the reference's reporters attach via registries)."""
        for rep in reporters:
            for q in queries:
                rep.report(q)
            rep.report(
                extra_groups={
                    "samza_spark.run_app.JobMetrics": {
                        f"output-rows-{k}": (-1 if v is None else v)
                        for k, v in result["outputs"].items()
                    }
                    or {"job-complete": 1}
                }
            )
        if reporters:
            result["metrics_snapshots"] = sum(r._seq for r in reporters)

    sql_stmts = []
    if cfg.props.get("samza.sql.stmt"):
        sql_stmts = [cfg.props["samza.sql.stmt"]]
    elif cfg.props.get("samza.sql.stmts"):
        sql_stmts = [
            s.strip() for s in cfg.props["samza.sql.stmts"].split(";") if s.strip()
        ]

    if sql_stmts:
        from samza_spark.sources.descriptors import FileSink
        from samza_spark.sql.runner import SqlApplication

        def out_path_fmt(system, stream):
            root = cfg.props.get(f"systems.{system}.stagingDirectory", "")
            path = f"{root.rstrip('/')}/{stream}" if root else stream
            fmt = cfg.props.get(f"streams.{stream}.samza.format", "parquet")
            return path, fmt

        app = SqlApplication(spark, compat_mode=False)
        for system, stream in cfg.task_inputs():
            src = cfg.build_source(system, stream)
            app.add_stream(stream, src.read(spark))
        for system, stream in cfg.task_outputs():
            path, fmt = out_path_fmt(system, stream)
            app.add_sink(stream, FileSink(path, fmt=fmt))
        result["kind"] = "sql"
        result["statements"] = len(sql_stmts)
        app.run("; ".join(sql_stmts))
        for system, stream in cfg.task_outputs():
            path, fmt = out_path_fmt(system, stream)
            try:
                result["outputs"][f"{system}.{stream}"] = (
                    spark.read.format(fmt).load(path).count()
                )
            except Exception:
                result["outputs"][f"{system}.{stream}"] = None
        _emit_metrics()
        return result

    app_class = cfg.props.get("app.class")
    if not app_class:
        raise ValueError(
            "config defines neither app.class nor samza.sql.stmt(s) — "
            "nothing to run"
        )
    app = _load_app(app_class)
    sources = cfg.build_sources()
    result["kind"] = "app"
    out = app(spark, cfg, sources)
    if out is None:
        _emit_metrics()
        return result
    # streaming query handles -> drain (AvailableNow/terminating jobs).
    # With a status registry, a `--operation kill` (or any
    # status.request_stop) is honored cooperatively between polls —
    # queries stop cleanly at the micro-batch boundary, the Samza
    # shutdown contract.
    if isinstance(out, (list, tuple)):
        if status_dir:
            import time as _time

            from samza_spark import status as jstatus

            active = list(out)
            while active:
                active = [q for q in active if q.isActive]
                if active and jstatus.stop_requested(
                    status_dir, cfg.job_name, job_id
                ):
                    for q in active:
                        q.stop()
                for q in active:
                    q.awaitTermination(0.5)
        else:
            for q in out:
                q.awaitTermination()
        _emit_metrics(out)
        return result
    df = getattr(out, "df", out)
    _write_plan(df)
    sink, name = _output_sink(cfg)
    if sink is not None:
        sink.write(df)
        result["outputs"][name] = None
    else:
        result["outputs"]["<stdout>"] = df.count()
    _emit_metrics()
    return result


def main(argv: "list[str] | None" = None) -> int:
    p = argparse.ArgumentParser(
        prog="samza_spark.run_app",
        description="Run a job from a Samza .properties config "
        "(run-app.sh / JobRunner analog).",
    )
    p.add_argument("--config-path", required=True, help="path to .properties")
    p.add_argument(
        "--config",
        action="append",
        default=[],
        metavar="K=V",
        help="override/add a config entry (repeatable, highest precedence)",
    )
    p.add_argument(
        "--operation",
        default="run",
        choices=["run", "status", "kill"],
        help="run the job, read its registry status, or request a stop "
        "(ApplicationRunnerMain operations; status/kill use the "
        "job.status.dir registry — see samza_spark.status)",
    )
    args = p.parse_args(argv)
    cfg = JobConfig.from_file(args.config_path)
    for kv in args.config:
        k, _, v = kv.partition("=")
        if not _:
            p.error(f"--config expects K=V, got {kv!r}")
        cfg.props[k.strip()] = v.strip()
    if args.operation in ("status", "kill"):
        import json as _json

        from samza_spark import status as jstatus

        store = cfg.props.get("job.status.dir") or os.environ.get(
            "SAMZA_SPARK_STATUS_DIR"
        )
        if not store:
            p.error(f"--operation {args.operation} needs job.status.dir "
                    "(or $SAMZA_SPARK_STATUS_DIR)")
        job_id = cfg.props.get("job.id", "1")
        if args.operation == "kill":
            payload = jstatus.request_stop(store, cfg.job_name, job_id)
        else:
            payload = jstatus.get_job(store, cfg.job_name, job_id)
        print(_json.dumps(payload, indent=2))
        return 0
    result = run_job(cfg)
    import json

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
