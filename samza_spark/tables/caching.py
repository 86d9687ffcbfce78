"""Read-through caching wrapper for remote tables.

Reference: CachingTableDescriptor (/root/reference samza-api/.../table/
descriptors/CachingTableDescriptor.java:38-101) and CachingTable
(samza-core/.../table/caching/CachingTable.java) — a Guava cache with
readTtl/writeTtl/size in front of a remote table.

Spark mapping: a per-executor-process LRU lives inside the lookup closure;
each executor caches independently (same as Samza's per-container cache).
"""

from __future__ import annotations

import time
from collections import OrderedDict
from typing import Mapping

from samza_spark.tables.remote import RemoteTable


class _LRU:
    def __init__(self, max_size: int, ttl_s: float | None):
        self.max_size = max_size
        self.ttl_s = ttl_s
        self._d: OrderedDict = OrderedDict()

    def get(self, k):
        item = self._d.get(k)
        if item is None:
            return None
        value, stamp = item
        if self.ttl_s is not None and time.monotonic() - stamp > self.ttl_s:
            del self._d[k]
            return None
        self._d.move_to_end(k)
        return value

    def put(self, k, v):
        self._d[k] = (v, time.monotonic())
        self._d.move_to_end(k)
        while len(self._d) > self.max_size:
            self._d.popitem(last=False)


class CachingTable(RemoteTable):
    """RemoteTable with a read-through per-executor cache
    (CachingTableDescriptor.withReadTtl/withCacheSize analogs)."""

    def __init__(self, inner: RemoteTable, cache_size: int = 10_000, read_ttl_s: float | None = None):
        cache = _LRU(cache_size, read_ttl_s)
        raw_lookup = inner.lookup_fn

        def cached_lookup(keys: list) -> Mapping:
            out, missing = {}, []
            for k in keys:
                hit = cache.get(k)
                if hit is not None:
                    out[k] = hit
                else:
                    missing.append(k)
            if missing:
                fetched = raw_lookup(missing)
                for k, v in fetched.items():
                    cache.put(k, v)
                out.update(fetched)
            return out

        super().__init__(
            cached_lookup,
            inner.key_col,
            inner.value_schema,
            inner.rate_limiter,
            inner.retry,
            inner.max_batch,
        )
