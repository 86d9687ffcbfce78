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
    return normalize_event_ts(spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")))


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Surface ``events.ts`` as a plain µs TIMESTAMP whichever way the
    driver generated the parquet (works on batch and streaming frames):

    - TIMESTAMP(NANOS) + ``nanosAsLong=true`` -> epoch-nanos BIGINT;
      integer DIV truncates to µs, matching epoch_ns(ts) // 1000 in DuckDB.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false) -> TIMESTAMP_NTZ; with the
      session tz pinned to UTC the cast reinterprets the same micros as an
      instant — identical values to the DuckDB view.
    """
    for f in df.schema.fields:
        if f.name != col:
            continue
        if isinstance(f.dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
        elif isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict:
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
