"""Instrumented kv_store_write profile (VERDICT r8 next #4).

BENCH_r08 recorded kv_store_write at 585k msg/s vs 748k in r7 (-22%)
against a cpu-calib gap of only ~6%, while PERF.md's run-B on identical
code settled at 722k — so the question is whether the durable-upsert
path grew a real cost or the driver-run artifact caught a bad minute of
a shared host. This script answers it with phase-level timing:

  repeat N times back-to-back (fresh store dir each run):
    open        — DurableLocalTable.open on an empty dir
    plan        — super().merge_batch (lazy anti-join/union; ~0 by design)
    changelog   — _append_changelog parquet write (the only real job)
  plus per-run cpu_calib_ms + loadavg, so within-session variance on
  IDENTICAL code is visible next to the phase that moves.

Usage: python tools/profile_kv_write.py [n_msgs] [n_runs]
"""

import os
import statistics
import sys
import tempfile
import time


def cpu_calib_ms() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(5_000_000):
        s += i
    return round((time.perf_counter() - t0) * 1000, 1)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    n_msgs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import functions as F

    from samza_spark.session import get_session
    from samza_spark.tables.local import DurableLocalTable

    spark = get_session()
    payload = spark.range(n_msgs).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v" * 248), F.col("id").cast("string")).alias("v"),
    )
    payload = payload.localCheckpoint()  # time the store, not the generator

    print(
        f"# kv_store_write profile: {n_msgs} msgs x {n_runs} runs "
        f"(same session, fresh dir per run)"
    )
    print(
        "run  open_s  plan_s  changelog_s  total_s   msg/s   calib_ms  load1/5/15"
    )
    totals = []
    for run in range(n_runs):
        root = tempfile.mkdtemp(prefix="prof_kv_")
        calib = cpu_calib_ms()
        t0 = time.perf_counter()
        table = DurableLocalTable.open(
            spark, f"{root}/store1", key_cols=["k"], schema="k long, v string"
        )
        t_open = time.perf_counter()
        # phase-split merge_batch: the lazy plan build vs the parquet job
        from samza_spark.tables.local import LocalTable

        LocalTable.merge_batch(table, payload, mode="upsert")
        t_plan = time.perf_counter()
        table._append_changelog(payload, "upsert")
        t_done = time.perf_counter()
        total = t_done - t0
        totals.append(total)
        la = os.getloadavg()
        print(
            f"{run:>3}  {t_open - t0:6.3f}  {t_plan - t_open:6.3f}  "
            f"{t_done - t_plan:11.3f}  {total:7.3f}  {n_msgs / total:7.0f}  "
            f"{calib:8.1f}  {la[0]:.2f}/{la[1]:.2f}/{la[2]:.2f}"
        )
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    med = statistics.median(totals)
    print(
        f"# median total {med:.3f}s = {n_msgs / med:.0f} msg/s; "
        f"spread {min(totals):.3f}-{max(totals):.3f}s "
        f"({(max(totals) - min(totals)) / med * 100:.0f}% of median)"
    )


if __name__ == "__main__":
    main()
