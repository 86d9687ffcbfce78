#!/usr/bin/env python3
"""Dump ``.explain("formatted")`` for named queries into per-query files.

Usage:
    python tools/dump_query_plans.py OUT_DIR SUFFIX [sf_dir] name [name ...]

Writes ``OUT_DIR/<name>_<SUFFIX>.txt`` for each name found in the
registry; silently skips unknown names (so one list can be replayed
against an older checkout that lacks some queries). Used for the
optimization-round evidence files ``plans/r11/<query>_{before,after}.txt``.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)

    from samza_spark import SessionConfig, get_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_session(
        SessionConfig(
            app_name="dump_query_plans",
            master=f"local[{cpus}]",
            shuffle_partitions=cpus,
            extra={"spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_BENCH_MEM", "8g")},
        )
    )
    spark.sparkContext.setLogLevel("ERROR")

    from samza_spark.queries import QUERIES

    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"# skip (not registered here): {name}", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - record the failure inline
            text = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
