"""Tables: point-lookup datasets joined against streams.

Reference: /root/reference samza-api/.../table/Table.java,
ReadWriteUpdateTable.java:46-140; SURVEY.md §2.7.
"""

from samza_spark.tables.local import DurableLocalTable, LocalTable, InMemoryTable
from samza_spark.tables.caching import CachingTable
from samza_spark.tables.remote import RemoteTable, RateLimiter, RetryPolicy

__all__ = [
    "LocalTable",
    "DurableLocalTable",
    "InMemoryTable",
    "CachingTable",
    "RemoteTable",
    "RateLimiter",
    "RetryPolicy",
]
