#!/usr/bin/env python3
"""Host-independent execution-shape stats for named queries.

Runs each query once against the noop sink (guide §1.4) and reports the
DETERMINISTIC shape of the execution rather than wall seconds: Spark job
count, stage count, task count, shuffle read/write bytes, and the number
of Python-evaluation nodes in the physical plan. These numbers do not
move with host speed, so they are valid before/after evidence on a box
whose timing drifts (each record still carries wall seconds and the CPU
calibration for context).

Usage: python tools/query_exec_stats.py name [name ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
import time
import urllib.request
from contextlib import redirect_stdout

sys.path.insert(0, ".")


def _cpu_calib_ms() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(5_000_000):
        s += i
    return round((time.perf_counter() - t0) * 1000, 1)


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: query_exec_stats.py name [name ...]", file=sys.stderr)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from samza_spark import SessionConfig, get_session

    spark = get_session(
        SessionConfig(
            app_name="query_exec_stats",
            master=f"local[{cpus}]",
            shuffle_partitions=cpus,
            extra={
                "spark.driver.memory": os.environ.get(
                    "SPARK_GRAFT_BENCH_MEM", "8g"),
                "spark.ui.enabled": "true",
            },
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    from samza_spark.queries import QUERIES

    QUERIES["passthrough"](spark, sf_dir).count()  # warm-up, uncounted

    def rest(path):
        return json.load(urllib.request.urlopen(f"{ui}/api/v1/{path}"))

    app = rest("applications")[0]["id"]

    def stage_snapshot():
        out = {}
        for st in rest(f"applications/{app}/stages?status=complete"):
            out[(st["stageId"], st["attemptId"])] = st
        return out

    results = {}
    for name in names:
        fn = QUERIES[name]
        before_jobs = {j["jobId"] for j in rest(f"applications/{app}/jobs")}
        before_stages = stage_snapshot()
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark.sparkContext.setJobDescription(f"exec_stats: {name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        jobs = [
            j for j in rest(f"applications/{app}/jobs")
            if j["jobId"] not in before_jobs
        ]
        new_stages = {
            k: v for k, v in stage_snapshot().items() if k not in before_stages
        }
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()

        def n_nodes(op):
            return len(re.findall(rf"^\(\d+\) {op}", plan, re.M))

        results[name] = {
            "jobs": len(jobs),
            "stages": len(new_stages),
            "tasks": sum(s["numCompleteTasks"] for s in new_stages.values()),
            "shuffle_read_mb": round(
                sum(s["shuffleReadBytes"] for s in new_stages.values())
                / 1e6, 3),
            "shuffle_write_mb": round(
                sum(s["shuffleWriteBytes"] for s in new_stages.values())
                / 1e6, 3),
            "plan_arrow_eval_python": n_nodes("ArrowEvalPython"),
            "plan_batch_eval_python": n_nodes("BatchEvalPython"),
            "plan_exchanges": n_nodes("Exchange"),
            "wall_sec_context_only": round(wall, 3),
        }
        print(f"# {name}: {results[name]}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus,
                      "cpu_calib_ms": min(_cpu_calib_ms() for _ in range(3)),
                      "results": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
