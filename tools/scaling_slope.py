"""Measured scaling slope for the flagship operators (VERDICT r9 next
#5): run the six headline ops at sf0.01 / sf0.1 (driver testdata) and
sf0.5 / sf1 (tools/gen_scale_data.py, same distributional signature)
and record wall time + output rows per point. The design claims
(single-shuffle banded dedup, capped buckets, grid-bucketed dbscan)
predict near-linear time in input rows wherever OUTPUT is also ~linear;
operators whose output is inherently quadratic in dup density (the
exact pair list) are expected to bend and the row counts make that
attributable — which is why rows are recorded next to seconds.

Timing is a full ``noop``-format write (computes every column, no
driver collect); row counts run untimed afterwards. One op runs at a
time on an otherwise idle box.

Usage: python tools/scaling_slope.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

OPS = (
    "minhash_pairs",
    "jaccard_prefix_join",
    "binary_near_dup",
    "curation_pipeline",
    "bm25_search",
    "dbscan_clusters",
)

SF_DIRS = (
    ("0.01", "/root/testdata/sf0.01"),
    ("0.1", "/root/testdata/sf0.1"),
    ("0.5", "scaledata/sf0.5"),
    ("1", "scaledata/sf1"),
)


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING.json"
    from __spark_entry__ import queries

    from samza_spark import SessionConfig, get_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_session(
        SessionConfig(
            app_name="samza_spark_scaling",
            master=f"local[{cpus}]",
            shuffle_partitions=cpus,
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    results: dict[str, dict[str, dict]] = {}
    for name in OPS:
        results[name] = {}
        for sf, d in SF_DIRS:
            df = qs[name](spark, d)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            secs = round(time.perf_counter() - t0, 3)
            rows = qs[name](spark, d).count()
            results[name][sf] = {"sec": secs, "rows": rows}
            print(f"{name:22s} sf{sf:>5s}: {secs:8.3f}s {rows:>12,d} rows",
                  flush=True)
    load = [round(x, 2) for x in os.getloadavg()]
    payload = {"ops": results, "cpus": cpus, "load_avg_end": load}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"written": out_path}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
