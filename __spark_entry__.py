"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementations live in :mod:`samza_spark.queries`; each exercises the
engine's operator modules (SURVEY.md §2 inventory).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 5-table broadcast join +
    decimal-exact revenue aggregation (samza_spark.queries.q_multiway_join_revenue)."""
    from samza_spark.queries import q_multiway_join_revenue

    return q_multiway_join_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from samza_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from samza_spark.queries import ORACLES

    return dict(ORACLES)


def query_meta() -> dict[str, dict[str, str]]:
    """Catalog metadata: {name: {"family": ..., "tier": ...}} for every
    queries() entry — tiers: exact | serving | streaming | report | canary
    (see samza_spark.registry_meta). Lets callers sample the 300+ query
    catalog by family instead of registration order."""
    from samza_spark.registry_meta import query_meta as _qm

    return _qm()
