"""Pure-Python Avro Object Container File codec + Spark integration.

The reference's HDFS surface is Avro-first — AvroFileHdfsReader
(/root/reference samza-hdfs/.../reader/AvroFileHdfsReader.java:41-74),
AvroDataFileHdfsWriter (samza-hdfs/.../writer/AvroDataFileHdfsWriter.scala)
— but the spark-avro connector jar is an external module that may be
absent (as in this environment). This module implements the Avro 1.x
binary encoding and OCF framing (public spec: avro.apache.org/docs/
current/specification/) in plain Python so Avro files remain readable and
writable WITHOUT the jar:

* ``read_avro``  — ``binaryFile`` scan + ``mapInPandas`` decode: each
  executor decodes whole container files in parallel (one task per file,
  the same unit AvroFileHdfsReader uses per split); the blob never
  reaches the driver (only one file HEADER is peeked for the schema).
* ``write_avro`` — ``foreachPartition`` writes one ``.avro`` container
  file per partition (AvroDataFileHdfsWriter writes per task the same
  way). Codecs: null and deflate.

When the spark-avro jar IS on the classpath, prefer it
(``format("avro")``) — JVM decode is far faster; FileSource tries the jar
first and falls back here. Supported schema features mirror
AvroRelConverter (samza-sql/.../avro/AvroRelConverter.java:63-158):
records, arrays, maps, nullable unions, enums (as strings), fixed (as
bytes), and the date/timestamp logical types (timestamps are UTC
instants: encoded from naive-as-UTC, decoded tz-aware).

PATH RESTRICTION: the write path (and the read path's header peek) uses
plain ``open()`` on POSIX paths — local mode or a shared mount. Raw
hdfs:// / abfss:// URIs require the JVM connectors; the ``binaryFile``
read scan itself is Hadoop-backed and follows Spark's filesystem support.
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid
import zlib
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from samza_spark.schema import avro_to_struct

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# Binary primitives (Avro spec "Binary encoding")
# ---------------------------------------------------------------------------


def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while (n & ~0x7F) != 0:
        out.write(bytes([(n & 0x7F) | 0x80]))
        n >>= 7
    out.write(bytes([n]))


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    return buf.read(n)


# ---------------------------------------------------------------------------
# Schema-driven value codec
# ---------------------------------------------------------------------------


def _norm_schema(schema: Any) -> Any:
    if isinstance(schema, str):
        s = schema.strip()
        if s.startswith("{") or s.startswith("["):
            return json.loads(s)
    return schema


def _type_name(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"] if isinstance(schema.get("type"), str) else _type_name(schema["type"])


def _to_logical_int(schema: Any, v: Any) -> int:
    """int/long encode honoring the date/timestamp logical types the
    writer-side schema derivation emits: datetime.date -> epoch days,
    datetime -> epoch millis/micros. Naive datetimes are taken as UTC
    instants (the decoder returns UTC-aware ones, so round-trips
    preserve the instant regardless of session timezone)."""
    import datetime as dt

    logical = schema.get("logicalType") if isinstance(schema, dict) else None
    if isinstance(v, dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=dt.timezone.utc)
        # integer-exact epoch micros: float .timestamp() loses sub-µs
        # precision past ~2100 (epoch*1e6 approaches 2^52), which rounds
        # a stored microsecond off by one
        delta = v - dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
        epoch_us = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
        if logical == "timestamp-millis":
            return epoch_us // 1000
        return epoch_us  # timestamp-micros (the derived default)
    if isinstance(v, dt.date):
        if logical == "date" or logical is None:
            return (v - dt.date(1970, 1, 1)).days
        raise ValueError(f"date value for non-date logical type {logical!r}")
    return int(v)


def _union_members(branches: list) -> "list[tuple[str, int]] | None":
    """``(member_name, union_index)`` per non-null branch of a MULTI-branch
    union (>1 non-null), else None. Names mirror
    :func:`samza_spark.schema._union_to_spark_type` (SURVEY.md §7.3 tagged
    struct convention)."""
    non_null = []
    for i, raw in enumerate(branches):
        b = _norm_schema(raw)
        if _type_name(b) == "null":
            continue
        name = b if isinstance(b, str) else b.get("name", b.get("type", f"member{len(non_null)}"))
        non_null.append((f"member_{name}", i))
    return non_null if len(non_null) > 1 else None


def _encode(out: io.BytesIO, schema: Any, v: Any) -> None:
    schema = _norm_schema(schema)
    if isinstance(schema, list):  # union: branch index + value
        members = _union_members(schema)
        if (
            members is not None
            and isinstance(v, dict)
            and set(v) <= {n for n, _ in members}
        ):
            # tagged-struct value from a Spark row: the one non-None
            # member selects the branch; all-None means null
            chosen = [(n, i) for n, i in members if v.get(n) is not None]
            if len(chosen) > 1:
                raise ValueError(
                    f"tagged union value sets multiple members: {v!r}"
                )
            if not chosen:
                idx = _pick_branch(schema, None)
                _write_long(out, idx)
                return
            name, idx = chosen[0]
            _write_long(out, idx)
            _encode(out, schema[idx], v[name])
            return
        idx = _pick_branch(schema, v)
        _write_long(out, idx)
        _encode(out, schema[idx], v)
        return
    t = _type_name(schema)
    if t == "null":
        return
    if v is None:
        # a null reaching a non-nullable branch must FAIL, not coerce
        # (str(None) would silently write the literal 'None')
        raise ValueError(
            f"null value for non-nullable avro type {t!r}; declare the field "
            "nullable (union with null) or drop the nulls before writing"
        )
    if t == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, _to_logical_int(schema, v))
    elif t == "float":
        out.write(struct.pack("<f", float(v)))
    elif t == "double":
        out.write(struct.pack("<d", float(v)))
    elif t == "bytes":
        _write_bytes(out, bytes(v))
    elif t == "string":
        _write_bytes(out, str(v).encode("utf-8"))
    elif t == "record":
        for f in schema["fields"]:
            _encode(out, f["type"], None if v is None else v.get(f["name"]))
    elif t == "array":
        items = list(v or [])
        if items:
            _write_long(out, len(items))
            for item in items:
                _encode(out, schema["items"], item)
        _write_long(out, 0)
    elif t == "map":
        entries = dict(v or {})
        if entries:
            _write_long(out, len(entries))
            for k, val in entries.items():
                _write_bytes(out, str(k).encode("utf-8"))
                _encode(out, schema["values"], val)
        _write_long(out, 0)
    elif t == "enum":
        _write_long(out, schema["symbols"].index(v))
    elif t == "fixed":
        out.write(bytes(v))
    else:
        raise ValueError(f"unsupported avro type for encode: {t!r}")


def _branch_matches(schema: Any, v: Any) -> bool:
    """Does the Python value type-match this (normalized) branch schema?
    Mirrors AvroRelConverter's union handling (AvroRelConverter.java:81-158):
    each value is written under the branch whose declared type it carries,
    so a ``["null","long","string"]`` union round-trips both longs and
    strings instead of forcing everything through the first non-null
    branch."""
    import datetime as dt

    t = _type_name(schema)
    logical = schema.get("logicalType") if isinstance(schema, dict) else None
    if t == "null":
        return v is None
    if v is None:
        return False
    if t == "boolean":
        return isinstance(v, bool)
    if t in ("int", "long"):
        if logical == "date":
            return isinstance(v, dt.date) and not isinstance(v, dt.datetime)
        if logical in ("timestamp-millis", "timestamp-micros"):
            return isinstance(v, dt.datetime)
        return isinstance(v, int) and not isinstance(v, bool)
    if t in ("float", "double"):
        return isinstance(v, float)
    if t == "string":
        return isinstance(v, str)
    if t == "bytes":
        return isinstance(v, (bytes, bytearray))
    if t == "fixed":
        return isinstance(v, (bytes, bytearray)) and len(v) == schema["size"]
    if t == "enum":
        return isinstance(v, str) and v in schema["symbols"]
    if t == "record":
        return isinstance(v, dict)
    if t == "map":
        return isinstance(v, dict)
    if t == "array":
        return isinstance(v, (list, tuple))
    return False


def _pick_branch(branches: list, v: Any) -> int:
    normed = [_norm_schema(b) for b in branches]
    # exact type match first (int before long / float before double is the
    # declaration order's call — first matching branch wins, per spec)
    for i, b in enumerate(normed):
        if _branch_matches(b, v):
            return i
    # tolerant fallbacks for representable widenings: an int value may
    # ride a float/double branch; otherwise keep the historical
    # first-non-null behavior (correct for single-non-null unions)
    if v is not None:
        for i, b in enumerate(normed):
            if isinstance(v, int) and _type_name(b) in ("float", "double"):
                return i
        for i, b in enumerate(normed):
            if _type_name(b) != "null":
                return i
    raise ValueError(f"no union branch for {v!r} in {branches!r}")


def _decode(buf: io.BytesIO, schema: Any) -> Any:
    schema = _norm_schema(schema)
    if isinstance(schema, list):
        idx = _read_long(buf)
        val = _decode(buf, schema[idx])
        members = _union_members(schema)
        if members is not None:
            # multi-branch union -> tagged struct (matches avro_to_struct)
            if val is None and _type_name(_norm_schema(schema[idx])) == "null":
                return None
            return {n: (val if i == idx else None) for n, i in members}
        return val
    t = _type_name(schema)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        n = _read_long(buf)
        return _apply_logical(schema, n)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "record":
        return {f["name"]: _decode(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix (spec-permitted)
                _read_long(buf)
                n = -n
            out.extend(_decode(buf, schema["items"]) for _ in range(n))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(buf, schema["values"])
        return out
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "fixed":
        return buf.read(schema["size"])
    raise ValueError(f"unsupported avro type for decode: {t!r}")


def _apply_logical(schema: Any, n: int) -> Any:
    import datetime as dt

    logical = schema.get("logicalType") if isinstance(schema, dict) else None
    if logical == "date":
        return dt.date(1970, 1, 1) + dt.timedelta(days=n)
    # Avro timestamps are UTC instants — decode tz-AWARE so Arrow /
    # mapInPandas can't reinterpret a naive datetime in the session
    # timezone and shift the instant
    if logical == "timestamp-millis":
        return dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
            milliseconds=n
        )
    if logical == "timestamp-micros":
        return dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
            microseconds=n
        )
    return n


# ---------------------------------------------------------------------------
# Object Container File framing
# ---------------------------------------------------------------------------


def write_ocf(fileobj, schema: Any, rows, codec: str = "null", block_rows: int = 4096) -> None:
    """Write rows (dicts matching the record schema) as one container file."""
    schema = _norm_schema(schema)
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = os.urandom(16)
    fileobj.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    hdr = io.BytesIO()
    _write_long(hdr, len(meta))
    for k, v in meta.items():
        _write_bytes(hdr, k.encode("utf-8"))
        _write_bytes(hdr, v)
    _write_long(hdr, 0)
    fileobj.write(hdr.getvalue())
    fileobj.write(sync)

    batch, count = io.BytesIO(), 0

    def flush():
        nonlocal batch, count
        if not count:
            return
        data = batch.getvalue()
        if codec == "deflate":
            data = zlib.compress(data)[2:-4]  # raw deflate per spec
        blk = io.BytesIO()
        _write_long(blk, count)
        _write_long(blk, len(data))
        fileobj.write(blk.getvalue())
        fileobj.write(data)
        fileobj.write(sync)
        batch, count = io.BytesIO(), 0

    for row in rows:
        _encode(batch, schema, row)
        count += 1
        if count >= block_rows:
            flush()
    flush()


def read_ocf_header(blob: bytes) -> tuple[dict, bytes, int]:
    """(metadata, sync_marker, header_end_offset) from container bytes."""
    if blob[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    buf = io.BytesIO(blob[4:])
    meta = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    sync = buf.read(16)
    return meta, sync, 4 + buf.tell()


def read_ocf(blob: bytes) -> Iterator[dict]:
    """Decode every row of a container file held in memory."""
    meta, sync, off = read_ocf_header(blob)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    buf = io.BytesIO(blob[off:])
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        count = _read_long(buf)
        size = _read_long(buf)
        data = buf.read(size)
        if codec == "deflate":
            data = zlib.decompress(data, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        block = io.BytesIO(data)
        for _ in range(count):
            yield _decode(block, schema)
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")


# ---------------------------------------------------------------------------
# Spark <-> Avro schema derivation (writer side)
# ---------------------------------------------------------------------------

_SPARK_TO_AVRO: dict[type, Any] = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.ByteType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.BinaryType: "bytes",
    T.StringType: "string",
    T.DateType: {"type": "int", "logicalType": "date"},
    T.TimestampType: {"type": "long", "logicalType": "timestamp-micros"},
}


def spark_to_avro_schema(dt: T.DataType, name: str = "record0", nullable: bool = False) -> Any:
    base: Any
    if isinstance(dt, T.StructType):
        base = {
            "type": "record",
            "name": name,
            "fields": [
                {
                    "name": f.name,
                    "type": spark_to_avro_schema(f.dataType, f"{name}_{f.name}", f.nullable),
                }
                for f in dt.fields
            ],
        }
    elif isinstance(dt, T.ArrayType):
        base = {
            "type": "array",
            "items": spark_to_avro_schema(dt.elementType, f"{name}_item", dt.containsNull),
        }
    elif isinstance(dt, T.MapType):
        base = {
            "type": "map",
            "values": spark_to_avro_schema(dt.valueType, f"{name}_value", dt.valueContainsNull),
        }
    elif type(dt) in _SPARK_TO_AVRO:
        base = _SPARK_TO_AVRO[type(dt)]
    elif isinstance(dt, T.DecimalType):
        base = "double"  # lossy; declare an explicit avro schema for exact decimals
    else:
        raise ValueError(f"cannot derive avro schema for spark type {dt.simpleString()}")
    return ["null", base] if nullable else base


# ---------------------------------------------------------------------------
# DataFrame read/write
# ---------------------------------------------------------------------------


def read_avro(spark: SparkSession, path: str, avro_schema: Any = None) -> DataFrame:
    """Read .avro container files into a DataFrame without the spark-avro
    jar: ``binaryFile`` scan + per-file executor-side decode. The schema
    comes from ``avro_schema`` or from peeking ONE file's header (the only
    driver-side read, a few KB)."""
    import pandas as pd

    if avro_schema is None:
        files = [
            r.path
            for r in spark.read.format("binaryFile")
            .load(path)
            .select("path")
            .limit(1)
            .collect()
        ]
        if not files:
            raise ValueError(f"no avro files at {path}")
        local = files[0].removeprefix("file:")
        with open(local, "rb") as f:
            head = f.read(1 << 20)
        meta, _, _ = read_ocf_header(head)
        avro_schema = json.loads(meta["avro.schema"].decode("utf-8"))
    avro_schema = _norm_schema(avro_schema)
    out_struct = avro_to_struct(avro_schema)
    cols = [f.name for f in out_struct.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                rows = list(read_ocf(bytes(blob)))
                yield pd.DataFrame(
                    {c: [r.get(c) for r in rows] for c in cols}, columns=cols
                )

    files_df = spark.read.format("binaryFile").load(path).select("content")
    return files_df.mapInPandas(decode, out_struct)


def write_avro(
    df: DataFrame,
    path: str,
    avro_schema: Any = None,
    codec: str = "null",
) -> Any:
    """Write a DataFrame as .avro container files, one file per partition
    (AvroDataFileHdfsWriter writes per task the same way), executor-side —
    rows never reach the driver. Returns the avro schema used.

    PATH RESTRICTION: files are opened with plain ``open()`` inside
    ``foreachPartition``, so ``path`` must be a driver+executor-visible
    POSIX path — local mode or a shared mount (NFS/FUSE). hdfs:// or
    abfss:// URIs need the spark-avro jar (``format("avro")``), which
    FileSink prefers whenever it is on the classpath; this module is the
    jar-less fallback."""
    schema = _norm_schema(avro_schema) if avro_schema else spark_to_avro_schema(df.schema, "topLevelRecord")
    os.makedirs(path, exist_ok=True)

    def write_partition(rows) -> None:
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return
        import itertools

        fname = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
        with open(fname, "wb") as f:
            write_ocf(
                f,
                schema,
                (r.asDict(recursive=True) for r in itertools.chain([first], it)),
                codec=codec,
            )

    df.foreachPartition(write_partition)
    return schema
