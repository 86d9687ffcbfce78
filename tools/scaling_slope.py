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

jaccard_prefix_join is measured through its PRODUCTION scale path —
``max_bucket_size=2000, on_capped='log'`` — on the registered query's
own ``doc_id % 4 = 0`` calibration subset (DISCLOSED here and in the
PERF.md row label: its sf1 point reads 12,500 docs where minhash_pairs
reads 50,000, so the two rows are a shape contrast, not a same-input
cost race), and not through the uncapped exactness-contract default
the registered oracle query uses: this
synthetic corpus draws every doc from a 30-word vocabulary, so each of
the handful of globally-rarest tokens lands in the prefix of ~40% of
all docs and the uncapped candidate join is THETA(n^2) by construction
(measured: one AQE-coalesced task grinding a ~10-million-pair bucket at
sf1). A real web corpus has a Zipfian vocabulary with millions of rare
tokens and tiny prefix buckets; where a corpus degenerates like this
one, the cap + census IS the documented operating mode (the census
names what was skipped). The banded-LSH twin (minhash_pairs) runs the
identical corpus uncapped and near-linearly — that contrast is the
point of having both.

Usage: python tools/scaling_slope.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

def _jaccard_capped(spark, sf_dir):
    from samza_spark.catalog import load_table
    from samza_spark.pipeline.dedup import jaccard_prefix_join

    docs = load_table(spark, sf_dir, "documents").filter("doc_id % 4 = 0")
    return jaccard_prefix_join(
        docs, tau_num=4, tau_den=5, max_bucket_size=2000, on_capped="log"
    )


OPS = (
    "minhash_pairs",
    "jaccard_prefix_join",  # capped production path — see module docstring
    "binary_near_dup",
    "curation_pipeline",
    "bm25_search",
    "dbscan_clusters",
)
OVERRIDES = {"jaccard_prefix_join": _jaccard_capped}

SF_DIRS = (
    ("0.01", "/root/testdata/sf0.01"),
    ("0.1", "/root/testdata/sf0.1"),
    ("0.5", "scaledata/sf0.5"),
    ("1", "scaledata/sf1"),
)


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING.json"
    # r11 (VERDICT r10 next #6): the Zipfian-vocabulary scaling run —
    #   SPARK_GRAFT_SCALING_DIRS="0.01:scaledata/sf0.01-zipf50000,..."
    #   SPARK_GRAFT_SCALING_OPS="jaccard_prefix_join,binary_near_dup"
    #   SPARK_GRAFT_SCALING_UNCAPPED=1   (run the registered uncapped
    #     jaccard path: realistic vocabularies have tiny prefix buckets,
    #     so the exactness-contract default should complete at sf1)
    global SF_DIRS, OPS, OVERRIDES
    env_dirs = os.environ.get("SPARK_GRAFT_SCALING_DIRS")
    if env_dirs:
        SF_DIRS = tuple(
            tuple(part.split(":", 1)) for part in env_dirs.split(",")
        )
    env_ops = os.environ.get("SPARK_GRAFT_SCALING_OPS")
    if env_ops:
        OPS = tuple(env_ops.split(","))
    if os.environ.get("SPARK_GRAFT_SCALING_UNCAPPED"):
        OVERRIDES = {}
    from __spark_entry__ import queries

    from samza_spark import SessionConfig, get_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    # the sf1 points hold ~10x the default corpus; the 1g local-mode
    # driver heap OOMs in the signature explode stages — size the single
    # local JVM like the multi-GB executor it stands in for
    mem = os.environ.get("SPARK_GRAFT_SCALING_MEM", "48g")
    spark = get_session(
        SessionConfig(
            app_name="samza_spark_scaling",
            master=f"local[{cpus}]",
            shuffle_partitions=cpus,
            extra={"spark.driver.memory": mem},
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    results: dict[str, dict[str, dict]] = {}
    def _flush() -> None:
        load = [round(x, 2) for x in os.getloadavg()]
        payload = {"ops": results, "cpus": cpus, "mem": mem,
                   "load_avg_end": load}
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)

    for name in OPS:
        results[name] = {}
        fn = OVERRIDES.get(name, qs[name])
        for sf, d in SF_DIRS:
            df = fn(spark, d)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            secs = round(time.perf_counter() - t0, 3)
            rows = fn(spark, d).count()
            results[name][sf] = {"sec": secs, "rows": rows}
            print(f"{name:22s} sf{sf:>5s}: {secs:8.3f}s {rows:>12,d} rows",
                  file=sys.stderr, flush=True)
            _flush()  # partial results survive a late-point failure
    print(json.dumps({"written": out_path}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
