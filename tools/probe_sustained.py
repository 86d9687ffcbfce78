"""Isolated probe for the sustained streaming bench rows (VERDICT r10
next #3): stream_sustained_dedup and stream_sustained_log_sink read
20-30% below r9 in BOTH r10 full-suite runs with no code change to
either path. What DID change in r10 is the bench JVM heap
(SPARK_GRAFT_BENCH_MEM default 8g; r9 ran the stock 1g), so this probe
reproduces bench.py's exact replay setup and measures ONLY the suspect
rows (plus the unregressed passthrough as a control) under a chosen
heap — run it twice (SPARK_GRAFT_BENCH_MEM=1g / =8g) on an idle box
and diff.

Usage: SPARK_GRAFT_BENCH_MEM=1g python tools/probe_sustained.py
Prints one JSON line: {heap, calib_ms, rows: {name: {median_sec,
msgs_per_sec, samples}}}.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    mem = os.environ.get("SPARK_GRAFT_BENCH_MEM", "8g")
    idle_load = 1.5
    la = os.getloadavg()
    if la[0] > idle_load or la[1] > idle_load or la[2] > 2 * idle_load:
        print(
            f"ERROR box not settled: load_avg {la[0]:.2f}/{la[1]:.2f}/"
            f"{la[2]:.2f}",
            file=sys.stderr,
        )
        return 3

    from pyspark.sql import functions as F

    from samza_spark import SessionConfig, get_session
    from samza_spark.catalog import normalize_event_ts
    from samza_spark.sources.log_datasource import log_sink

    spark = get_session(
        SessionConfig(
            app_name="probe_sustained",
            master=f"local[{cpus}]",
            shuffle_partitions=cpus,
            extra={"spark.driver.memory": mem},
        )
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _calib() -> float:
        t0 = time.perf_counter()
        s = 0
        for i in range(5_000_000):
            s += i
        return round((time.perf_counter() - t0) * 1000, 1)

    calib = min(_calib() for _ in range(3))

    events_raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = events_raw.count()
    schema = events_raw.schema

    replay_dir = tempfile.mkdtemp(prefix="probe_replay_")
    rows = {}
    try:
        replicas = max(1, 1_000_000 // max(n_events, 1))
        for i in range(replicas):
            events_raw.withColumn(
                "event_id", F.col("event_id") + F.lit(i * 10_000_000)
            ).write.mode("overwrite" if i == 0 else "append").parquet(
                replay_dir
            )
        n_replay = replicas * n_events

        def run(name, start_query, parts):
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            samples = []
            for _ in range(reps):
                t0 = time.perf_counter()
                q = start_query()
                q.awaitTermination()
                samples.append(round(time.perf_counter() - t0, 3))
            spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
            med = round(statistics.median(samples), 3)
            rows[name] = {
                "median_sec": med,
                "msgs_per_sec": round(n_replay / med),
                "samples": samples,
            }
            print(f"# {name}: {med}s {samples}", file=sys.stderr)

        # control: the unregressed passthrough shape
        run(
            "stream_sustained_1m",
            lambda: (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", max(1, replicas // 5))
                .parquet(replay_dir)
                .filter(F.col("event_type") != "")
                .select("event_id", "user_id", "event_type")
                .writeStream.format("noop")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            ),
            parts=cpus,
        )

        run(
            "stream_sustained_dedup_1m",
            lambda: (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", max(1, replicas // 2))
                .parquet(replay_dir)
                .transform(normalize_event_ts)
                .withWatermark("ts", "30 minutes")
                .dropDuplicatesWithinWatermark(["event_id"])
                .select("event_id", "user_id", "event_type")
                .writeStream.format("noop")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            ),
            parts=8,
        )

        _seq = [0]

        def start_log_sink():
            _seq[0] += 1
            dst = tempfile.mkdtemp(prefix=f"probe_logsink_{_seq[0]}_")
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", max(1, replicas // 2))
                .parquet(replay_dir)
                .select(
                    F.col("event_id").cast("string").alias("key"),
                    F.col("event_type").alias("value"),
                    (F.col("event_id") % 100000).alias("timestamp_ms"),
                )
                .writeStream.foreachBatch(
                    log_sink(f"{dst}/log", n_partitions=cpus)
                )
                .trigger(availableNow=True)
                .start()
            )

        run("stream_sustained_log_sink_1m", start_log_sink, parts=cpus)
    finally:
        shutil.rmtree(replay_dir, ignore_errors=True)

    print(
        json.dumps(
            {"heap": mem, "calib_ms": calib, "n_replay": n_replay,
             "rows": rows}
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
