"""Job status registry + CLI — the samza-rest read surface without a
server.

Reference surface:

* samza-rest/.../resources/JobsResource.java (``GET /v1/jobs``,
  ``GET /v1/jobs/{jobName}/{jobId}``, ``PUT ?status=stopped``) and
  model/Job.java:29-47 — payload ``{jobName, jobId, status,
  statusDetail}`` with JobStatus.java:25-44 values
  ``starting | started | stopped | unknown``.
* samza-rest/.../resources/TasksResource.java + model/Task.java:30-46 —
  per-task ``{taskName, containerId, preferredHost, partitions:
  [{system, stream, partitionId}], storeNames}``.
* samza-api ApplicationStatus (New/Running/SuccessfulFinish/
  UnsuccessfulFinish) supplies ``statusDetail`` for finished jobs.

Spark-first: local mode has no YARN RM to proxy, so the registry is a
directory of atomically-renamed JSON files that ``run_app.run_job``
maintains around each run (``job.status.dir`` /
``$SAMZA_SPARK_STATUS_DIR``); the functions here return exactly the
REST payload dicts, and the CLI prints them, so any HTTP layer (or a
human with ``cat``) serves the same contract the reference's dashboard
consumes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

STARTING = "starting"
STARTED = "started"
STOPPED = "stopped"
UNKNOWN = "unknown"

SUCCESSFUL_FINISH = "SuccessfulFinish"
UNSUCCESSFUL_FINISH = "UnsuccessfulFinish"


def _entry_path(store: str, job_name: str, job_id: str) -> str:
    return os.path.join(store, f"{job_name}-{job_id}.json")


def _write(path: str, payload: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True)
    os.replace(tmp, path)


def record_status(
    store: str,
    job_name: str,
    job_id: str = "1",
    status: str = STARTED,
    status_detail: "str | None" = None,
) -> dict:
    """Upsert one job's status entry (Job.java payload shape) and
    return it. ``updatedAtEpochMs`` is ours — the reference's proxy
    queries YARN live; a file registry needs a staleness stamp."""
    payload = {
        "jobName": job_name,
        "jobId": job_id,
        "status": status,
        "statusDetail": status_detail,
        "updatedAtEpochMs": int(time.time() * 1000),
    }
    _write(_entry_path(store, job_name, job_id), payload)
    return payload


def get_job(store: str, job_name: str, job_id: str = "1") -> dict:
    """``GET /v1/jobs/{jobName}/{jobId}`` payload; UNKNOWN if absent
    (JobsResource returns 404 — a dict keeps the CLI composable)."""
    try:
        with open(_entry_path(store, job_name, job_id)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {
            "jobName": job_name,
            "jobId": job_id,
            "status": UNKNOWN,
            "statusDetail": None,
        }


def list_jobs(store: str) -> "list[dict]":
    """``GET /v1/jobs`` payload: every installed job, name-sorted."""
    if not os.path.isdir(store):
        return []
    out = []
    for fn in sorted(os.listdir(store)):
        if fn.endswith(".json") and not fn.endswith(".tmp"):
            try:
                with open(os.path.join(store, fn)) as f:
                    out.append(json.load(f))
            except (OSError, ValueError):
                continue
    return sorted(out, key=lambda j: (j.get("jobName", ""), j.get("jobId", "")))


def request_stop(store: str, job_name: str, job_id: str = "1") -> dict:
    """``PUT /v1/jobs/{name}/{id}?status=stopped`` analog: flip the
    entry to stopped (the local runner observes it cooperatively via
    :func:`stop_requested` between batches)."""
    cur = get_job(store, job_name, job_id)
    return record_status(
        store, job_name, job_id, STOPPED, cur.get("statusDetail")
    )


def stop_requested(store: str, job_name: str, job_id: str = "1") -> bool:
    return get_job(store, job_name, job_id).get("status") == STOPPED


def list_tasks(job_model: dict) -> "list[dict]":
    """``GET /v1/jobs/{name}/{id}/tasks`` payload from a JobModel
    (TasksResource reads the job coordinator's model the same way):
    Task.java rows with partitions as ``{system, stream, partitionId}``.
    ``preferredHost`` is always ``localhost`` in local mode (the
    LocalityManager answer a single-host deployment gives)."""
    tasks = []
    for cid, cont in sorted(job_model.get("containers", {}).items()):
        for tname, t in sorted(cont.get("tasks", {}).items()):
            tasks.append(
                {
                    "taskName": tname,
                    "containerId": cid,
                    "preferredHost": "localhost",
                    "partitions": [
                        {
                            "system": s["system"],
                            "stream": s["stream"],
                            "partitionId": s["partition"],
                        }
                        for s in t.get("system-stream-partitions", [])
                    ],
                    "storeNames": t.get("store-names", []),
                }
            )
    return tasks


def main(argv: "list[str] | None" = None) -> int:
    p = argparse.ArgumentParser(
        prog="samza_spark.status",
        description="Job status registry (samza-rest JobsResource/"
        "TasksResource payloads, file-backed).",
    )
    p.add_argument(
        "--store",
        default=os.environ.get("SAMZA_SPARK_STATUS_DIR", ".samza_status"),
        help="registry directory (default $SAMZA_SPARK_STATUS_DIR)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("jobs", help="GET /v1/jobs")
    g = sub.add_parser("job", help="GET /v1/jobs/{name}/{id}")
    g.add_argument("job_name")
    g.add_argument("job_id", nargs="?", default="1")
    s = sub.add_parser("stop", help="PUT /v1/jobs/{name}/{id}?status=stopped")
    s.add_argument("job_name")
    s.add_argument("job_id", nargs="?", default="1")
    t = sub.add_parser("tasks", help="GET /v1/jobs/{name}/{id}/tasks")
    t.add_argument("job_model_path")
    args = p.parse_args(argv)
    if args.cmd == "jobs":
        print(json.dumps(list_jobs(args.store), indent=2))
    elif args.cmd == "job":
        print(json.dumps(get_job(args.store, args.job_name, args.job_id), indent=2))
    elif args.cmd == "stop":
        print(json.dumps(request_stop(args.store, args.job_name, args.job_id), indent=2))
    elif args.cmd == "tasks":
        from samza_spark.jobmodel import load_job_model

        model = load_job_model(args.job_model_path)
        if model is None:
            print(f"no job model at {args.job_model_path}", file=sys.stderr)
            return 1
        print(json.dumps(list_tasks(model), indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
