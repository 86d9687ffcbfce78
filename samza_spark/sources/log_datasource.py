"""Partitioned replayable log as a Python streaming DataSource.

Reference: Samza's consumption model is ``SystemConsumer`` polling per
SystemStreamPartition from a checkpointed offset (samza-api/.../system/
SystemConsumer.java, SystemStreamPartition.java), with ``OffsetManager``
persisting per-SSP offsets (samza-core/.../checkpoint/OffsetManager.java)
and startpoints seeding them (samza-api/.../startpoint/*.java).

Spark-native equivalent: a DataSource V2 (Python API, Spark 4) whose
stream reader exposes exactly that contract —

* the log is a directory of per-partition append-only JSONL files
  (``part-<k>.jsonl``), each record ``{"key", "value", "timestamp_ms"}``
  — the Kafka wire shape :func:`samza_spark.sources.descriptors.
  from_kafka_records` already decodes;
* offsets are per-partition record ordinals, tracked in a producer-
  maintained ``_manifest.json`` so ``latestOffset`` is an O(#partitions)
  manifest read, never a log scan (the role of Kafka's index files —
  at scale the driver must not re-count a 100 TB log every trigger);
* ``partitions(start, end)`` emits one InputPartition per SSP with a
  half-open ordinal range — executors read their file slice in
  parallel, so parallelism == partition count exactly like the
  reference's container/task assignment;
* Spark's own streaming offset log plays OffsetManager: after a restart
  the engine replays from the checkpointed offset dict, giving the same
  at-least-once-with-checkpointed-offsets contract (exactly-once into
  idempotent sinks);
* the ``startpoint`` option maps Samza startpoints: ``oldest`` (0 per
  partition), ``upcoming`` (manifest counts at query start),
  ``specific`` (explicit JSON offsets dict), ``timestamp``
  (+ ``startpointTimestampMs`` — earliest offset with timestamp >=
  target per partition, resolved through the block timestamp index the
  producer maintains: the Kafka ``.timeindex`` / ``offsetsForTimes``
  analog, so resolution scans one append block, never the log).

The batch reader reads the whole log (bounded source), so the same
format serves ``spark.read`` and ``spark.readStream``.

Schema (fixed, wire-shaped)::

    partition int, offset long, key string, value string, timestamp_ms long
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = "partition int, offset long, key string, value string, timestamp_ms long"

_MANIFEST = "_manifest.json"
_TS_INDEX = "_ts_index.json"


# -- producer helpers (the SystemProducer analog) ---------------------------


def _manifest_path(log_dir: str) -> str:
    return os.path.join(log_dir, _MANIFEST)


def read_manifest(log_dir: str) -> dict[int, int]:
    """Per-partition record counts (the high-water marks)."""
    try:
        with open(_manifest_path(log_dir)) as f:
            raw = json.load(f)
    except FileNotFoundError:
        return {}
    return {int(k): int(v) for k, v in raw.items()}


def _ts_index_path(log_dir: str) -> str:
    return os.path.join(log_dir, _TS_INDEX)


def read_ts_index(log_dir: str) -> "dict[int, list[list[int]]]":
    """Per-partition ``[(block_start_ordinal, block_max_ts_ms), ...]`` —
    the Kafka ``.timeindex`` analog: one entry per producer append, so a
    timestamp startpoint resolves by scanning ONE block, not the log."""
    try:
        with open(_ts_index_path(log_dir)) as f:
            raw = json.load(f)
    except FileNotFoundError:
        return {}
    return {int(k): [[int(a), int(b)] for a, b in v] for k, v in raw.items()}


def append_records(
    log_dir: str,
    partition: int,
    records: "list[tuple[str | None, str, int]]",
) -> int:
    """Append ``(key, value, timestamp_ms)`` records to one partition's
    log file and advance its manifest high-water mark. Returns the new
    count. Appends are atomic per call (single write + manifest rewrite)
    — the single-writer-per-partition discipline the reference's
    producers follow. Each append also adds a (start_ordinal, max_ts)
    entry to the timestamp index serving ``startpoint=timestamp``."""
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, f"part-{partition}.jsonl")
    with open(path, "a", encoding="utf-8") as f:
        for key, value, ts in records:
            f.write(
                json.dumps(
                    {"key": key, "value": value, "timestamp_ms": int(ts)},
                    ensure_ascii=True,
                )
                + "\n"
            )
    counts = read_manifest(log_dir)
    start = counts.get(partition, 0)
    counts[partition] = start + len(records)
    if records:
        idx = read_ts_index(log_dir)
        idx.setdefault(partition, []).append(
            [start, max(int(ts) for _, _, ts in records)]
        )
        tmp = _ts_index_path(log_dir) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({str(k): v for k, v in idx.items()}, f)
        os.replace(tmp, _ts_index_path(log_dir))
    tmp = _manifest_path(log_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({str(k): v for k, v in counts.items()}, f)
    os.replace(tmp, _manifest_path(log_dir))
    return counts[partition]


# -- readers ----------------------------------------------------------------


class _RangePartition(InputPartition):
    def __init__(self, log_dir: str, partition: int, start: int, end: int):
        self.log_dir = log_dir
        self.partition = partition
        self.start = start
        self.end = end


def _read_range(part: _RangePartition) -> Iterator[tuple]:
    path = os.path.join(part.log_dir, f"part-{part.partition}.jsonl")
    if part.end <= part.start or not os.path.exists(path):
        return
    with open(path, encoding="utf-8") as f:
        for off, line in enumerate(f):
            if off >= part.end:
                break
            if off < part.start:
                continue
            rec = json.loads(line)
            yield (
                part.partition,
                off,
                rec.get("key"),
                rec.get("value"),
                rec.get("timestamp_ms"),
            )


class SamzaLogBatchReader(DataSourceReader):
    def __init__(self, options):
        self.log_dir = options["path"]

    def partitions(self) -> Sequence[InputPartition]:
        counts = read_manifest(self.log_dir)
        return [
            _RangePartition(self.log_dir, p, 0, n) for p, n in sorted(counts.items())
        ] or [_RangePartition(self.log_dir, 0, 0, 0)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        return _read_range(partition)


class SamzaLogStreamReader(DataSourceStreamReader):
    """Per-SSP offset-range micro-batch reader.

    Offsets are dicts ``{str(partition): next_ordinal}`` — JSON-stable,
    which is what Spark persists in the checkpoint offset log. New
    partitions appearing mid-stream start at 0 (oldest), matching the
    reference's handling of repartition-free topic growth (a partition
    is only ever appended)."""

    def __init__(self, options):
        self.log_dir = options["path"]
        self.startpoint = options.get("startpoint", "oldest")
        self.startpoint_offsets = options.get("startpointoffsets")
        self.startpoint_ts_ms = options.get("startpointtimestampms")
        self.max_per_trigger = int(options.get("maxrecordspertrigger", 0)) or None
        # Last batch-end offsets this reader planned/committed. Pacing is
        # applied in latestOffset() — the offset Spark COMMITS — never in
        # partitions(): clamping the read range below the committed end
        # offset silently skips the records in between, forever.
        self._last_end: dict[str, int] | None = None

    def initialOffset(self) -> dict:
        counts = read_manifest(self.log_dir)
        if self.startpoint == "oldest":
            off = {str(p): 0 for p in counts}
        elif self.startpoint == "upcoming":
            off = {str(p): n for p, n in counts.items()}
        elif self.startpoint == "specific":
            off = {
                str(k): int(v)
                for k, v in json.loads(self.startpoint_offsets or "{}").items()
            }
        elif self.startpoint == "timestamp":
            # StartpointTimestamp (samza-api/.../startpoint/
            # StartpointTimestamp.java) == Kafka offsetsForTimes: per
            # partition, the EARLIEST offset whose timestamp >= target.
            # The block timestamp index narrows the scan to one producer
            # append (the .timeindex role) — never a full log read.
            if self.startpoint_ts_ms is None:
                raise ValueError(
                    "startpoint=timestamp needs option startpointTimestampMs"
                )
            target = int(self.startpoint_ts_ms)
            idx = read_ts_index(self.log_dir)
            off = {}
            for p, n in counts.items():
                blocks = idx.get(p, [])
                # first block that can contain a qualifying record
                # (entries are append-ordered; max_ts is monotone for
                # monotone producers, the same assumption Kafka's time
                # index makes)
                scan_from = None
                for start_ord, max_ts in blocks:
                    if max_ts >= target:
                        scan_from = start_ord
                        break
                if scan_from is None:
                    off[str(p)] = n  # nothing at/after target -> upcoming
                    continue
                found = n
                for row in _read_range(
                    _RangePartition(self.log_dir, p, scan_from, n)
                ):
                    if int(row[4]) >= target:
                        found = row[1]
                        break
                off[str(p)] = found
        else:
            raise ValueError(f"unknown startpoint {self.startpoint!r}")
        self._last_end = dict(off)
        return off

    def latestOffset(self) -> dict:
        counts = read_manifest(self.log_dir)
        latest = {str(p): n for p, n in counts.items()}
        if self.max_per_trigger is None or self._last_end is None:
            # No pacing, or first trigger after a checkpoint restart (the
            # planner worker is fresh and initialOffset is not re-called,
            # so the committed start is unknown until partitions() runs):
            # report the true high-water mark — one unpaced batch, but
            # every record is delivered exactly once.
            return latest
        paced = {}
        for p_str, hi in latest.items():
            lo = self._last_end.get(p_str, 0)
            paced[p_str] = min(int(hi), max(lo, 0) + self.max_per_trigger)
        return paced

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # end is the offset Spark will commit for this batch — read ALL of
        # [start, end); pacing already happened when end was chosen.
        self._last_end = {str(k): int(v) for k, v in end.items()}
        out = []
        for p_str, hi in end.items():
            lo = int(start.get(p_str, 0))
            hi = int(hi)
            if hi > lo:
                out.append(_RangePartition(self.log_dir, int(p_str), lo, hi))
        # Spark requires >= 1 partition per planned batch; an empty range
        # yields no rows
        return out or [_RangePartition(self.log_dir, 0, 0, 0)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        return _read_range(partition)

    def commit(self, end: dict) -> None:
        # Spark's checkpoint offset log is the durable OffsetManager; the
        # source itself is immutable so there is nothing to acknowledge.
        # Track the committed end so pacing stays anchored even if a
        # trigger plans no partitions.
        self._last_end = {str(k): int(v) for k, v in end.items()}


class SamzaLogDataSource(DataSource):
    """``spark.dataSource.register(SamzaLogDataSource)`` then
    ``spark.read.format("samza_log").option("path", d)`` or
    ``spark.readStream.format("samza_log")...``."""

    @classmethod
    def name(cls) -> str:
        return "samza_log"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SamzaLogBatchReader:
        return SamzaLogBatchReader(self.options)

    def streamReader(self, schema) -> SamzaLogStreamReader:
        return SamzaLogStreamReader(self.options)
