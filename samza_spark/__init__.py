"""samza_spark — a PySpark-native analytics/stream-processing engine with the
query and data-processing capabilities of Apache Samza.

This is NOT a port of Samza's container runtime: the engine re-expresses
Samza's three API layers (low-level task, high-level streams DSL, streaming
SQL — see /root/reference samza-api/.../operators/MessageStream.java:50 and
samza-sql/.../runner/SamzaSqlApplication.java:52) as idiomatic Spark:

* layer 2 (streams DSL)  -> :mod:`samza_spark.operators` over DataFrames
* layer 3 (SQL)          -> :mod:`samza_spark.sql` over ``spark.sql``
* tables / state         -> :mod:`samza_spark.tables`
* connectors             -> :mod:`samza_spark.sources`
* stateful extensions    -> :mod:`samza_spark.streaming`
* LLM-data-pipeline ops  -> :mod:`samza_spark.pipeline`
* job runner / planning  -> :mod:`samza_spark.run_app`,
  :mod:`samza_spark.execution` (plan.json + column lineage),
  :mod:`samza_spark.jobmodel`, :mod:`samza_spark.status`,
  :mod:`samza_spark.advisor` (plan scale audit)
"""

from samza_spark.session import get_session, SessionConfig

__version__ = "0.1.0"

__all__ = ["get_session", "SessionConfig", "__version__"]
