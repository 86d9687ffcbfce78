"""Benchmark driver: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

The metric is total wall-clock over the headline suite (lower is better);
per-query seconds let the judge compare against BASELINE.md workloads
(#1 stateless passthrough ≈ `passthrough`/`filter`; #3/#4 stateful windowed
count ≈ `tumbling_window`/`session_window`).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline queries: parity core + windows + joins + pipeline ops.
HEADLINE = [
    "passthrough",
    "filter",
    "merge",
    "stream_table_join",
    "multiway_join_revenue",
    "interval_join",
    "asof_join",
    "groupby_count",
    "tumbling_window",
    "session_window",
    "tpch_q1",
    "topk",
    "dedup_exact_groups",
    "text_metrics",
    "minhash_pairs",
    "cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from samza_spark import SessionConfig, get_session

    spark = get_session(
        SessionConfig(
            app_name="samza_spark_bench",
            master=f"local[{cpus}]",
            shuffle_partitions=cpus,
        )
    )
    spark.sparkContext.setLogLevel("ERROR")

    from samza_spark.queries import QUERIES

    # warm the JVM + file listing + Python worker pool once (excluded from
    # timing — one-time process startup, the analog of JVM/codegen warm-up)
    QUERIES["passthrough"](spark, sf_dir).count()
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")  # no type hints: this module
    # uses postponed annotations, which the UDF hint-inference can't resolve
    spark.range(cpus * 4).repartition(cpus).select(F.sum(_warm(F.col("id")))).collect()

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        per_query[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {per_query[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(per_query.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
