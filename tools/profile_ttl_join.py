"""Profile the sustained stream-stream TTL join (VERDICT r7 next #4).

Reproduces bench.py's `stream_sustained_join_1m` workload (two-sided
watermarked interval equi-join, 2x1M consumed messages) and breaks the
wall clock down from StreamingQueryProgress: trigger phases
(addBatch/getBatch/walCommit/...) and per-operator state-store time
(allUpdatesTimeMs / allRemovalsTimeMs / commitTimeMs), across the
tuning axes that matter for a two-sided state store:

* state partitions (spark.sql.shuffle.partitions at plan time)
* trigger size (maxFilesPerTrigger)
* state-store provider (HDFSBacked vs RocksDB)

Usage: python3 tools/profile_ttl_join.py [sf_dir] — prints one result
block per variant; findings land in PERF.md (round-8 section).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def normalize_event_ts(df):
    from samza_spark.catalog import normalize_event_ts as _n

    return _n(df)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    events_raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = events_raw.count()
    schema = events_raw.schema

    replay_dir = tempfile.mkdtemp(prefix="ttl_profile_")
    try:
        replicas = max(1, 1_000_000 // max(n_events, 1))
        for i in range(replicas):
            events_raw.withColumn(
                "event_id", F.col("event_id") + F.lit(i * 10_000_000)
            ).write.mode("overwrite" if i == 0 else "append").parquet(replay_dir)
        n_replay = replicas * n_events

        def join_side(prefix, files_per_trigger):
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", files_per_trigger)
                .parquet(replay_dir)
                .transform(normalize_event_ts)
                .select(
                    F.col("event_id").alias(f"{prefix}_id"),
                    F.col("user_id").alias(f"{prefix}_user"),
                    F.col("ts").alias(f"{prefix}_ts"),
                )
                .withWatermark(f"{prefix}_ts", "30 minutes")
            )

        def run(tag, parts, files_per_trigger, provider=None):
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            if provider:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", provider
                )
            t0 = time.perf_counter()
            q = (
                join_side("l", files_per_trigger)
                .join(
                    join_side("r", files_per_trigger),
                    (F.col("l_id") == F.col("r_id"))
                    & (
                        F.col("r_ts")
                        >= F.col("l_ts") - F.expr("INTERVAL 10 MINUTES")
                    )
                    & (
                        F.col("r_ts")
                        <= F.col("l_ts") + F.expr("INTERVAL 10 MINUTES")
                    ),
                    "inner",
                )
                .writeStream.format("noop")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = time.perf_counter() - t0
            phases: dict = {}
            state = {
                "allUpdatesTimeMs": 0,
                "allRemovalsTimeMs": 0,
                "commitTimeMs": 0,
            }
            rows_total = 0
            n_batches = 0
            for p in q.recentProgress:
                n_batches += 1
                for k, v in (p.get("durationMs") or {}).items():
                    phases[k] = phases.get(k, 0) + v
                for so in p.get("stateOperators") or []:
                    for k in state:
                        state[k] += so.get(k, 0) or 0
                    rows_total = max(rows_total, so.get("numRowsTotal", 0) or 0)
            rate = round(2 * n_replay / wall)
            print(f"== {tag}: {wall:.2f}s  {rate} msg/s  batches={n_batches}")
            tot = sum(phases.values()) or 1
            for k, v in sorted(phases.items(), key=lambda kv: -kv[1]):
                print(f"   phase {k:<22} {v/1000:8.2f}s  {100*v/tot:5.1f}%")
            print(
                f"   state  updates={state['allUpdatesTimeMs']/1000:.2f}s "
                f"removals={state['allRemovalsTimeMs']/1000:.2f}s "
                f"commit={state['commitTimeMs']/1000:.2f}s "
                f"peak_rows={rows_total}"
            )
            return wall, rate

        results = {}
        # baseline = bench configuration
        base_fpt = max(1, replicas // 2)
        results["p16_base"] = run("parts=16 fpt=replicas/2 (bench baseline)", 16, base_fpt)
        results["p16_onebatch"] = run("parts=16 single-batch", 16, replicas)
        results["p8"] = run("parts=8", 8, base_fpt)
        results["p32"] = run("parts=32", 32, base_fpt)
        results["p16_rocks"] = run(
            "parts=16 RocksDB",
            16,
            base_fpt,
            provider="org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        print("\nsummary (msg/s):")
        for k, (w, r) in results.items():
            print(f"  {k:<16} {r}")
        return 0
    finally:
        shutil.rmtree(replay_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
