"""Settled re-run of named bench rows (VERDICT r9 next #2): the r9
driver bench ran on a warm box (idle gate timed out at load15 3.44) and
four audit-tier rows recorded 15-35% regressions with no plan change.
This re-measures exactly those rows with bench.py's discipline — idle
gate (hard, no timeout pass-through), clearCache + driver gc per
sample, median of N fresh samples — PLUS one untimed warm-up pass per
row (stricter than bench.py, which only warms the session: this tool's
question is "did the PLAN get slower", so one-time codegen/listing
init must not contaminate any timed sample) — so PERF.md can attribute
the r9 deltas to machine state or to a real cost.

Usage: python tools/settled_rerun.py [name ...]   (default: the r9 four)
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")

DEFAULT_ROWS = ("knn_label_noise", "retrieval_eval", "bm25_search",
                "cosine_topk")


def main() -> int:
    names = sys.argv[1:] or list(DEFAULT_ROWS)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5"))
    idle_load = 1.5
    la = os.getloadavg()
    if la[0] > idle_load or la[1] > idle_load or la[2] > 2 * idle_load:
        print(
            f"ERROR box not settled: load_avg {la[0]:.2f}/{la[1]:.2f}/"
            f"{la[2]:.2f} (need <= {idle_load}/{idle_load}/{2 * idle_load})"
            " — a settled re-run on a warm box proves nothing",
            file=sys.stderr,
        )
        return 3

    from samza_spark import SessionConfig, get_session
    from samza_spark.queries import QUERIES

    spark = get_session(
        SessionConfig(
            app_name="samza_spark_settled_rerun",
            master=f"local[{cpus}]",
            shuffle_partitions=cpus,
        )
    )
    spark.sparkContext.setLogLevel("ERROR")

    # same single-thread calibration stamp bench.py carries
    def _cpu_calib_ms() -> float:
        t0 = time.perf_counter()
        s = 0
        for i in range(5_000_000):
            s += i
        return round((time.perf_counter() - t0) * 1000, 1)

    # bench.py's warm-up discipline: one untimed pass of the session
    # (codegen/file-listing/JVM init) AND one untimed pass of each row
    # itself, so the first TIMED sample is never the one paying one-time
    # init — at sub-2s rows that warm-up sample otherwise dominates the
    # median (measured: bm25_search first sample 4.4s vs 1.1s warm).
    QUERIES["passthrough"](spark, sf_dir).count()

    out = {}
    for name in names:
        spark.catalog.clearCache()
        QUERIES[name](spark, sf_dir).count()  # untimed per-row warm-up
        samples = []
        for _ in range(repeats):
            spark.catalog.clearCache()
            gc.collect()
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        out[name] = {
            "median_sec": round(statistics.median(samples), 3),
            "samples": [round(s, 3) for s in samples],
        }
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "queries": out,
                "cpu_calib_ms": min(_cpu_calib_ms() for _ in range(3)),
                "load_avg_start": [round(x, 2) for x in la],
                "load_avg_end": [round(x, 2) for x in os.getloadavg()],
                "sf_dir": sf_dir,
                "repeats": repeats,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
