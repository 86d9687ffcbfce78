"""Remote table as a Python DataSource with filter pushdown.

Reference: Samza remote tables answer point lookups through
``TableReadFunction.getAsync`` (samza-api/.../table/remote/
TableReadFunction.java), and SamzaSqlFilterRemoteJoinRule pushes stream-side
predicates below the lookup so fewer remote calls happen
(samza-sql/.../planner/SamzaSqlFilterRemoteJoinRule.java:1-261).

Spark-native equivalent (SURVEY.md §4.2 item 2): a DataSource V2 (Python
API, Spark 4.1 ``pushFilters``) whose reader converts pushed key-equality
predicates (``EqualTo`` / ``In`` on the key column) into point lookups
against the backing service — Catalyst's own pushdown then plays the role
of the reference's custom HEP rule. Non-key predicates stay in Spark.

Services are plain picklable Python objects. Spark instantiates the data
source reader in a separate planning worker process, so no in-process
registry can resolve them — instead the service is cloudpickled into the
reader's options (data source options are the only channel that reaches
every process). ``load_remote_table`` does this for you; a real client
object should carry endpoint config and open connections lazily in
``read``::

    svc = DictService({1: {"name": "a"}}, key="id")
    df = load_remote_table(spark, svc, key="id", schema="id int, name string")
    df.filter(df.id == 1)   # -> one get([1]) call, no full scan
"""

from __future__ import annotations

import base64
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    In,
    InputPartition,
)


def _encode_service(service) -> str:
    from pyspark import cloudpickle

    return base64.b64encode(cloudpickle.dumps(service)).decode("ascii")


def _decode_service(payload: str):
    import pickle

    return pickle.loads(base64.b64decode(payload))


def load_remote_table(spark, service, key: str, schema):
    """Read a remote lookup service as a DataFrame with key-predicate
    pushdown. ``service`` needs ``get(keys) -> list[dict]`` and
    ``scan() -> iterable[dict]`` (scan may raise for lookup-only stores).

    Call once per query: Spark may cache the pushed-down scan built for an
    earlier query on the same relation object, so reusing one returned
    DataFrame for BOTH filtered and unfiltered queries can replay a stale
    key set (observed on 4.1: ``df.filter(k==7).collect(); df.count()``
    returns 1). A fresh load is only option plumbing — no remote calls."""
    register_datasource(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return (
        spark.read.format("samza_remote")
        .option("service_pickle", _encode_service(service))
        .option("key", key)
        .schema(schema)
        .load()
    )


class DictService:
    """In-memory reference service (remote-table test double). Counts calls
    so tests can assert pushdown actually avoided the scan."""

    def __init__(self, rows: dict, key: str):
        self.rows = rows  # key value -> {value columns}
        self.key = key
        self.get_calls = 0
        self.scan_calls = 0

    def get(self, keys):
        self.get_calls += 1
        return [
            {self.key: k, **self.rows[k]} for k in keys if k in self.rows
        ]

    def scan(self):
        self.scan_calls += 1
        return [{self.key: k, **v} for k, v in self.rows.items()]


class LookupOnlyService:
    """Wrap a service to forbid full scans — point-lookup-only remote
    stores (the common case for Samza remote tables); a query that cannot
    push its key predicate fails loudly instead of scanning the world."""

    def __init__(self, inner):
        self.inner = inner

    def get(self, keys):
        return self.inner.get(keys)

    def scan(self):
        raise RuntimeError(
            "this remote table is lookup-only: the key predicate was not "
            "pushed down (add an equality/IN filter on the key column)"
        )


class RemoteTableReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        payload = options.get("service_pickle")
        self.key_col = options.get("key")
        if not payload or not self.key_col:
            raise ValueError(
                "samza_remote requires 'service_pickle' and 'key' options "
                "(use load_remote_table)"
            )
        self.service = _decode_service(payload)
        self.pushed_keys: list | None = None

    def pushFilters(self, filters):
        for f in filters:
            # ColumnPath is a tuple of name parts; only top-level key cols
            if isinstance(f, EqualTo) and f.attribute == (self.key_col,):
                self.pushed_keys = (self.pushed_keys or []) + [f.value]
            elif isinstance(f, In) and f.attribute == (self.key_col,):
                self.pushed_keys = (self.pushed_keys or []) + list(f.value)
            else:
                yield f  # Spark evaluates the rest post-scan

    def partitions(self):
        return [InputPartition(0)]

    def read(self, partition) -> Iterator[tuple]:
        names = [f.name for f in self.schema.fields]
        if self.pushed_keys is not None:
            rows = self.service.get(sorted(set(self.pushed_keys)))
        else:
            rows = self.service.scan()
        for r in rows:
            yield tuple(r.get(n) for n in names)


class RemoteTableDataSource(DataSource):
    """``spark.read.format("samza_remote")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "samza_remote"

    def reader(self, schema) -> RemoteTableReader:
        return RemoteTableReader(schema, self.options)


def register_datasource(spark) -> None:
    spark.dataSource.register(RemoteTableDataSource)
