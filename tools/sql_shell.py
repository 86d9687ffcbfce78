#!/usr/bin/env python3
"""Interactive SQL shell entry point (CliShell analog, SURVEY.md §3.4).

Usage: python3 tools/sql_shell.py [sf_dir]
Registers the testdata parquet tables as views and drops into the REPL.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession

from samza_spark.catalog import load_table, TABLES
from samza_spark.sql.shell import repl


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("samza-spark-sql-shell")
        .config("spark.sql.shuffle.partitions", cpus)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    repl(spark)


if __name__ == "__main__":
    main()
