"""Remote tables: rate-limited, retrying, batching lookups against external
services — the one genuinely new physical component (SURVEY.md §4.2).

Reference: TableReadFunction/TableWriteFunction (/root/reference
samza-api/.../table/remote/*.java), TableRateLimiter
(samza-core/.../table/remote/TableRateLimiter.java), retry policies
(samza-api/.../table/retry/), batching (samza-api/.../table/batching/).

Spark mapping: the lookup runs inside ``mapInPandas`` so each *partition*
holds one client + one token bucket; Arrow batches amortise the Python
boundary, and the batch size doubles as the remote-call batch
(CompactBatchProvider analog). At 1000 executors the aggregate QPS is
``executors * rate``, which is exactly how Samza's per-task rate limiter
composes (TableRateLimiter is per task instance).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Iterator, Mapping, Sequence

import pandas as pd

from pyspark.sql import DataFrame


class RateLimiter:
    """Token-bucket limiter (TableRateLimiter analog): ``rate`` credits/sec,
    burst up to ``burst`` credits."""

    def __init__(self, rate: float, burst: float | None = None):
        self.rate = float(rate)
        self.capacity = float(burst if burst is not None else rate)
        self._tokens = self.capacity
        self._last = time.monotonic()

    def acquire(self, credits: float = 1.0) -> None:
        # A request larger than the bucket can ever hold is drawn in
        # capacity-sized instalments (Guava acquires >burst by waiting out
        # the debt); otherwise tokens never reach `credits` and this spins.
        while credits > 0:
            chunk = min(credits, self.capacity)
            while True:
                now = time.monotonic()
                self._tokens = min(self.capacity, self._tokens + (now - self._last) * self.rate)
                self._last = now
                if self._tokens >= chunk:
                    self._tokens -= chunk
                    break
                time.sleep((chunk - self._tokens) / self.rate)
            credits -= chunk


@dataclass
class RetryPolicy:
    """Exponential-backoff retry (samza-api/.../table/retry/TableRetryPolicy)."""

    max_attempts: int = 3
    backoff_s: float = 0.05
    backoff_multiplier: float = 2.0
    retryable: Callable[[Exception], bool] = lambda e: True

    def run(self, fn: Callable, *args):
        delay = self.backoff_s
        for attempt in range(1, self.max_attempts + 1):
            try:
                return fn(*args)
            except Exception as e:  # noqa: BLE001 — policy decides
                if attempt == self.max_attempts or not self.retryable(e):
                    raise
                time.sleep(delay)
                delay *= self.backoff_multiplier


class RemoteTable:
    """Service-backed table looked up by key.

    ``lookup_fn(keys: list) -> dict[key, value_row(dict)]`` is the user's
    TableReadFunction.getAllAsync analog — it receives a *batch* of keys
    (batching built in, samza-api/.../table/batching/) and returns found
    rows; missing keys behave as inner/left join misses.
    """

    def __init__(
        self,
        lookup_fn: Callable[[list], Mapping],
        key_col: str,
        value_schema: str,
        rate_limiter: RateLimiter | None = None,
        retry: RetryPolicy | None = None,
        max_batch: int = 1000,
    ):
        self.lookup_fn = lookup_fn
        self.key_col = key_col
        self.value_schema = value_schema
        self.rate_limiter = rate_limiter
        self.retry = retry or RetryPolicy()
        self.max_batch = max_batch

    def enrich(self, df: DataFrame, how: str = "inner") -> DataFrame:
        """Stream-table join against the remote service
        (StreamTableJoinOperatorImpl.java:45-81 uses table.getAsync; here the
        whole Arrow batch is one getAll call)."""
        key_col = self.key_col
        lookup_fn, retry, limiter, max_batch = (
            self.lookup_fn,
            self.retry,
            self.rate_limiter,
            self.max_batch,
        )
        in_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        out_schema = f"{in_ddl}, {self.value_schema}"
        value_fields = [f.strip().split()[0] for f in self.value_schema.split(",")]
        inner = how == "inner"

        def lookup_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for start in range(0, len(pdf), max_batch):
                    chunk = pdf.iloc[start : start + max_batch]
                    keys = chunk[key_col].tolist()
                    if limiter is not None:
                        limiter.acquire(len(keys))
                    found = retry.run(lookup_fn, keys)
                    rows = chunk.copy()
                    for f in value_fields:
                        rows[f] = [
                            (found.get(k) or {}).get(f) for k in keys
                        ]
                    if inner:
                        rows = rows[[k in found for k in keys]]
                    yield rows

        return df.mapInPandas(lookup_batches, out_schema)


class CouchbaseTable(RemoteTable):
    """Couchbase-backed remote table (samza-kv-couchbase
    CouchbaseTableReadFunction.java:74-120 / CouchbaseTableWriteFunction
    analog, sharing BaseCouchbaseTableFunction's rate-limit/retry/batch
    stack via RemoteTable).

    ``client`` is any object with ``get_multi(keys) -> dict[key, dict]``
    (the couchbase SDK's bucket wrapped, or a dict-backed fake in tests).
    Without one, the real SDK is probed at call time — it is an optional
    dependency exactly as samza-kv-couchbase is an optional module."""

    def __init__(
        self,
        bucket: str,
        key_col: str,
        value_schema: str,
        client=None,
        **kwargs,
    ):
        self.bucket = bucket
        if client is None:
            try:
                import couchbase  # noqa: F401
            except ImportError as exc:
                raise NotImplementedError(
                    "the couchbase Python SDK is not installed in this "
                    "environment; pass client= (any object with "
                    "get_multi(keys) -> dict) or install couchbase "
                    "(reference parity: samza-kv-couchbase is optional)"
                ) from exc
            from couchbase.cluster import Cluster  # pragma: no cover

            raise NotImplementedError(
                "direct SDK wiring requires cluster credentials; construct "
                "the bucket client and pass client="
            )  # pragma: no cover
        super().__init__(
            lookup_fn=lambda keys: client.get_multi(keys),
            key_col=key_col,
            value_schema=value_schema,
            **kwargs,
        )
