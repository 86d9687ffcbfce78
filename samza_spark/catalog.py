"""Table catalog: load the test-data star schema and register views.

Centralises the one environment quirk: the driver-generated parquet stores
``events.ts`` as TIMESTAMP(NANOS), which Spark's vectorized parquet reader
rejects; with ``spark.sql.legacy.parquet.nanosAsLong=true`` it surfaces as
a BIGINT of epoch-nanos, which we convert to a proper microsecond
TIMESTAMP (truncation — matching DuckDB's TIMESTAMP_NS -> TIMESTAMP cast,
so oracle comparisons agree).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always broadcast in joins.
BROADCAST_TABLES = {"region", "nation", "supplier", "customer", "part"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    try:  # runtime-settable; needed when the caller's session didn't set them
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # oracle comparisons assume UTC epoch math regardless of driver tz
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # nanos-as-long columns -> TIMESTAMP (µs), truncating like a NS->US cast
    for f in df.schema.fields:
        if isinstance(f.dataType, T.LongType) and f.name == "ts":
            # integer DIV (truncation) — matches epoch_ns(ts) // 1000 in DuckDB
            df = df.withColumn(f.name, F.timestamp_micros(F.expr(f"{f.name} div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict:
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
