"""Local tables: the Spark analog of Samza's RocksDB / in-memory KV tables.

Reference: RocksDbTableDescriptor (/root/reference samza-kv-rocksdb/.../
RocksDbTableDescriptor.java:47,201-207,342), InMemoryKeyValueStore
(samza-kv-inmemory/.../InMemoryKeyValueStore.java), ReadWriteUpdateTable
(samza-api/.../table/ReadWriteUpdateTable.java:46-140).

Samza keeps a per-task RocksDB instance fed by a changelog topic; under
Spark a *local table* is simply a keyed DataFrame that joins (usually
broadcast) against the stream — durability comes from the backing files /
checkpoint rather than a changelog. ``get/put/putAll/delete/range/all``
(KeyValueStore.java:40-152) map to lookups/upserts expressed relationally
so they stay distributed.

TTL (RocksDbTableDescriptor.withTtl, :201-207) maps to a timestamp column +
filter on read.
"""

from __future__ import annotations

import time
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


class LocalTable:
    """A keyed, updatable dataset held as a DataFrame.

    Mutations are relational (union + dedup-by-key keeping latest) so the
    same code path works for a 1k-row dim table and a 10 TB keyed table —
    only the join strategy changes (broadcast vs shuffle).
    """

    TTL_COL = "__ss_put_ms"

    def __init__(
        self,
        df: DataFrame,
        key_cols: Sequence[str],
        ttl_ms: int | None = None,
        compact_every: int = 10,
    ):
        self.key_cols = list(key_cols)
        self.ttl_ms = ttl_ms
        self._df = df
        # Every mutation stacks an anti-join+union on the plan; a
        # long-running upsert stream would otherwise build an ever-deeper
        # lineage (and re-execute it per batch). Truncate via eager
        # localCheckpoint every ``compact_every`` mutations — plan depth
        # stays O(compact_every) for any stream length.
        self.compact_every = compact_every
        self._mutations_since_compact = 0

    def _maybe_compact(self) -> None:
        self._mutations_since_compact += 1
        if self.compact_every and self._mutations_since_compact >= self.compact_every:
            self._df = self._df.localCheckpoint(eager=True)
            self._mutations_since_compact = 0

    # -- construction ------------------------------------------------------

    @classmethod
    def from_parquet(cls, spark: SparkSession, path: str, key_cols: Sequence[str]) -> "LocalTable":
        return cls(spark.read.parquet(path), key_cols)

    # -- read side ---------------------------------------------------------

    @property
    def df(self) -> DataFrame:
        df = self._df
        if self.ttl_ms is not None and self.TTL_COL in df.columns:
            cutoff = int(time.time() * 1000) - self.ttl_ms
            df = df.filter(F.col(self.TTL_COL) >= F.lit(cutoff))
        return df.drop(self.TTL_COL) if self.TTL_COL in df.columns else df

    def as_broadcast(self) -> DataFrame:
        """Hint the table as the broadcast side of a lookup join — the moral
        equivalent of Samza shipping the table to every task's RocksDB."""
        return F.broadcast(self.df)

    def get_all(self) -> DataFrame:
        """KeyValueStore.all (KeyValueStore.java:152)."""
        return self.df

    def range(self, col: str, lo, hi) -> DataFrame:
        """Ordered range scan (KeyValueStore.range, KeyValueStore.java:130).
        Relational translation: a between-filter Catalyst pushes to the scan."""
        return self.df.filter((F.col(col) >= lo) & (F.col(col) < hi))

    # -- write side (ReadWriteUpdateTable.java:78-140) ---------------------

    def merge_batch(self, updates: DataFrame, mode: str = "upsert") -> "LocalTable":
        """Upsert a batch of rows: last-writer-wins per key.

        Implements sendTo(table) / UpdateOptions partial update
        (SendToTableOperatorImpl, SendToTableWithUpdateOperatorImpl) without
        Delta: anti-join old rows that are being replaced, union the new.
        """
        updates = updates.select(*self._df.columns) if set(self._df.columns) <= set(updates.columns) else updates
        if mode == "upsert":
            survivors = self._df.join(
                updates.select(*self.key_cols), on=self.key_cols, how="left_anti"
            )
            self._df = survivors.unionByName(updates, allowMissingColumns=True)
        elif mode == "delete":
            self._df = self._df.join(
                updates.select(*self.key_cols), on=self.key_cols, how="left_anti"
            )
        else:
            raise ValueError(f"unknown merge mode {mode!r}")
        self._maybe_compact()
        return self

    def update_batch(
        self,
        updates: DataFrame,
        insert_missing: bool = False,
        defaults: Mapping | None = None,
    ) -> "LocalTable":
        """Partial update: ``updates`` carries the key columns plus any
        subset of value columns; unspecified columns keep their current
        value (column-wise MERGE).

        Implements sendTo(table, UpdateOptions)
        (SendToTableWithUpdateOperatorImpl; UpdateOptions UPDATE_ONLY vs
        UPDATE_WITH_DEFAULTS, samza-api/.../operators/UpdateOptions.java):
        ``insert_missing=False`` = UPDATE_ONLY (rows for unknown keys are
        dropped); ``insert_missing=True`` = UPDATE_WITH_DEFAULTS (unknown
        keys become new rows, absent columns from ``defaults`` or null).
        """
        defaults = dict(defaults or {})
        upd_cols = [c for c in updates.columns if c not in self.key_cols]
        bad = set(upd_cols) - set(self._df.columns)
        if bad:
            raise ValueError(f"update columns not in table schema: {sorted(bad)}")
        u = updates.select(
            *self.key_cols, *[F.col(c).alias(f"__u_{c}") for c in upd_cols]
        )
        how = "full_outer" if insert_missing else "left_outer"
        existing = self._df.withColumn("__exists", F.lit(True))
        merged = existing.join(u, on=self.key_cols, how=how)
        is_new = F.col("__exists").isNull()
        out_cols = []
        for c in self._df.columns:
            if c in self.key_cols:
                out_cols.append(F.col(c))
            elif c in upd_cols:
                out_cols.append(F.coalesce(F.col(f"__u_{c}"), F.col(c)).alias(c))
            elif c in defaults:
                # defaults fill only newly-inserted rows; existing nulls stay
                out_cols.append(
                    F.when(is_new, F.lit(defaults[c])).otherwise(F.col(c)).alias(c)
                )
            else:
                out_cols.append(F.col(c))
        self._df = merged.select(*out_cols)
        self._maybe_compact()
        return self

    def write_stream(self, stream) -> object:
        """sendTo(table) from a streaming source: per-micro-batch merge via
        foreachBatch (SURVEY.md §2.1 sendTo(table))."""
        return stream.sink(lambda batch, _epoch: self.merge_batch(batch))


class DurableLocalTable(LocalTable):
    """Parquet-warehouse-backed local table — the changelog-restore analog
    of Samza's KeyValueStorageEngine (/root/reference samza-kv/src/main/
    scala/org/apache/samza/storage/kv/KeyValueStorageEngine.scala:44-157):
    every mutation appends the POST-IMAGE of the affected keys (or delete
    markers) to ``{path}/changelog/``; construction restores the
    ``{path}/base/`` snapshot plus the changelog with last-writer-wins per
    key, so state survives session restarts. Compaction (every
    ``compact_every`` mutations, same knob as the in-memory lineage
    truncation) snapshots the table to base/ and truncates the changelog —
    restore cost stays O(table + recent mutations), the exact shape of
    Samza's changelog-topic restore.

    Paths must be visible to the driver's filesystem (local or shared
    mount): data moves through Spark jobs, but directory bookkeeping
    (existence checks, changelog truncation) uses python ``os``.
    """

    OP_COL = "__ss_op"
    SEQ_COL = "__ss_seq"

    def __init__(
        self,
        df: DataFrame,
        key_cols: Sequence[str],
        path: str,
        ttl_ms: int | None = None,
        compact_every: int = 10,
        seq: int = 0,
    ):
        super().__init__(df, key_cols, ttl_ms=ttl_ms, compact_every=compact_every)
        self._path = path
        self._seq = seq

    # -- construction / restore -------------------------------------------

    @staticmethod
    def _has_parquet(d: str) -> bool:
        import os

        return os.path.isdir(d) and any(
            f.endswith(".parquet") for f in os.listdir(d)
        )

    @classmethod
    def open(
        cls,
        spark: SparkSession,
        path: str,
        key_cols: Sequence[str],
        schema=None,
        ttl_ms: int | None = None,
        compact_every: int = 10,
    ) -> "DurableLocalTable":
        """Open (restoring if the warehouse has state) or create (empty,
        ``schema`` required) a durable table at ``path``."""
        import os

        base, clog = os.path.join(path, "base"), os.path.join(path, "changelog")
        have_base, have_clog = cls._has_parquet(base), cls._has_parquet(clog)
        if not have_base and not have_clog:
            if schema is None:
                raise ValueError(
                    f"no state at {path!r} and no schema to create an empty table"
                )
            return cls(
                spark.createDataFrame([], schema),
                key_cols,
                path,
                ttl_ms=ttl_ms,
                compact_every=compact_every,
            )
        parts = []
        if have_base:
            parts.append(
                spark.read.parquet(base)
                .withColumn(cls.OP_COL, F.lit("upsert"))
                .withColumn(cls.SEQ_COL, F.lit(-1).cast("long"))
            )
        seq = 0
        if have_clog:
            clog_df = spark.read.parquet(clog)
            parts.append(clog_df)
            seq = (clog_df.agg(F.max(cls.SEQ_COL)).first()[0] or 0) + 1
        allrows = parts[0]
        for p in parts[1:]:
            allrows = allrows.unionByName(p)
        from pyspark.sql import Window

        w = Window.partitionBy(*key_cols).orderBy(F.desc(cls.SEQ_COL))
        df = (
            allrows.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .filter(F.col(cls.OP_COL) != "delete")
            .drop(cls.OP_COL, cls.SEQ_COL, "__rn")
            # materialize the restore once (the 50 MB/s restore analog);
            # lookups then hit the checkpointed rows, not base+changelog
            .localCheckpoint(eager=True)
        )
        return cls(
            df, key_cols, path, ttl_ms=ttl_ms, compact_every=compact_every, seq=seq
        )

    # -- write-through changelog ------------------------------------------

    def _append_changelog(self, rows: DataFrame, op: str) -> None:
        import os

        out = rows
        for f in self._df.schema.fields:
            if f.name not in out.columns:
                out = out.withColumn(f.name, F.lit(None).cast(f.dataType))
        (
            out.select(*self._df.columns)
            .withColumn(self.OP_COL, F.lit(op))
            .withColumn(self.SEQ_COL, F.lit(self._seq).cast("long"))
            .write.mode("append")
            .parquet(os.path.join(self._path, "changelog"))
        )
        self._seq += 1

    def merge_batch(self, updates: DataFrame, mode: str = "upsert") -> "DurableLocalTable":
        if mode == "delete":
            keys = updates.select(*self.key_cols).distinct()
            super().merge_batch(updates, mode)
            self._append_changelog(keys, "delete")
        else:
            super().merge_batch(updates, mode)
            # the updates ARE the post-image for their keys (merge_batch
            # requires per-key-unique update rows), so append them
            # directly — the previous distinct + semi-join read-back cost
            # two extra full shuffles per batch on the durable write path
            self._append_changelog(updates, "upsert")
        return self

    def update_batch(
        self,
        updates: DataFrame,
        insert_missing: bool = False,
        defaults: Mapping | None = None,
    ) -> "DurableLocalTable":
        keys = updates.select(*self.key_cols).distinct()
        super().update_batch(updates, insert_missing=insert_missing, defaults=defaults)
        post = self._df.join(keys, on=self.key_cols, how="left_semi")
        self._append_changelog(post, "upsert")
        return self

    def _maybe_compact(self) -> None:
        import os
        import shutil

        self._mutations_since_compact += 1
        if self.compact_every and self._mutations_since_compact >= self.compact_every:
            # checkpoint BEFORE overwriting base: the plan may still read
            # base/, and eager materialization breaks that dependency
            self._df = self._df.localCheckpoint(eager=True)
            self._mutations_since_compact = 0
            self._df.write.mode("overwrite").parquet(os.path.join(self._path, "base"))
            shutil.rmtree(os.path.join(self._path, "changelog"), ignore_errors=True)


class InMemoryTable(LocalTable):
    """Small dict-backed table (InMemoryKeyValueStore analog) for tests and
    bootstrap-style side inputs."""

    @classmethod
    def from_rows(
        cls,
        spark: SparkSession,
        rows: Sequence[Mapping] | Sequence[tuple],
        schema,
        key_cols: Sequence[str],
    ) -> "InMemoryTable":
        return cls(spark.createDataFrame(rows, schema), key_cols)
