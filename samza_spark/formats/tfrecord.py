"""TFRecord container + hand-rolled ``tf.train.Example`` wire codec.

Both layers are PUBLIC formats (TensorFlow's documented record framing —
``tensorflow/core/lib/io/record_writer.cc`` — and the
``example.proto``/``feature.proto`` message shapes), implemented here
with NO tensorflow/protobuf dependency: the framing is struct-packed
with masked-CRC32C integrity words, and Example messages are encoded /
decoded directly in protobuf wire format (the varint + LEN subset those
messages use). This is the export container the trainer side of a
data pipeline consumes; it plays the role the reference's jar-less Avro
OCF path plays for HDFS interop (samza-hdfs/.../HdfsSystemProducer.java,
see formats/avro_py.py) — self-describing files, splittable BY FILE.

Framing (per record)::

    uint64 length (LE) | uint32 masked_crc32c(length_bytes) |
    payload | uint32 masked_crc32c(payload)

    masked_crc(c) = ((c >> 15 | c << 17) + 0xa282ead8) mod 2^32

Scale notes: writes happen per-partition via ``mapInPandas`` (one file
per task, no driver funnel; the returned manifest is the unit a
downstream trainer shards on). Reads parallelize over the file manifest
— TFRecord has no intra-file sync points, so FILE COUNT is the read
parallelism, exactly the OCF trade documented in avro_py. CRC32C is
table-driven pure Python with an optional ``crc32c`` C-extension fast
path (import-gated; the pure path keeps the sandbox dependency-free).

Exactness: int64 and bytes features round-trip losslessly; float
features are protobuf FloatList = IEEE float32 and therefore LOSSY for
Python doubles — the writer refuses floats unless the caller opts in
(``allow_float32=True``), the same contract the quantization ops use.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterable, Iterator

try:  # optional C fast path
    import crc32c as _crc32c_ext  # type: ignore
except Exception:  # pragma: no cover - not in the sandbox image
    _crc32c_ext = None

# -- CRC32C (Castagnoli, reflected poly 0x82F63B78) --------------------------

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes, crc: int = 0) -> int:
    """CRC32C checksum (check value: crc32c(b'123456789') == 0xE3069283)."""
    if _crc32c_ext is not None:
        return _crc32c_ext.crc32c(data, crc)
    c = crc ^ 0xFFFFFFFF
    tbl = _CRC_TABLE
    for b in data:
        c = tbl[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# -- protobuf wire primitives (varint + LEN only) -----------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _len_field(field_num: int, payload: bytes) -> bytes:
    return _varint(field_num << 3 | 2) + _varint(len(payload)) + payload


# -- tf.train.Example codec ---------------------------------------------------


def encode_example(features: dict, *, allow_float32: bool = False) -> bytes:
    """Encode ``{name: value}`` into ``tf.train.Example`` wire bytes.

    value kinds: ``bytes``/``str`` -> BytesList; ``int`` -> Int64List
    (packed); ``float`` -> FloatList (packed float32, opt-in); a list of
    one kind encodes the multi-valued feature. Keys are emitted in
    sorted order so the encoding is deterministic (protobuf map order is
    unspecified; pinning it makes files byte-comparable across runs)."""
    entries = []
    for name in sorted(features):
        vals = features[name]
        if not isinstance(vals, (list, tuple)):
            vals = [vals]
        if vals and isinstance(vals[0], str):
            vals = [v.encode("utf-8") for v in vals]
        if not vals:
            raise ValueError(f"feature {name!r} is empty")
        if isinstance(vals[0], (bytes, bytearray)):
            blist = b"".join(_len_field(1, bytes(v)) for v in vals)
            feature = _len_field(1, blist)  # Feature.bytes_list = 1
        elif isinstance(vals[0], bool):
            raise TypeError(f"feature {name!r}: bool is ambiguous, cast to int")
        elif isinstance(vals[0], int):
            packed = b"".join(
                _varint(v & 0xFFFFFFFFFFFFFFFF) for v in vals
            )  # int64 two's complement
            ilist = _len_field(1, packed)  # Int64List.value packed
            feature = _len_field(3, ilist)  # Feature.int64_list = 3
        elif isinstance(vals[0], float):
            if not allow_float32:
                raise TypeError(
                    f"feature {name!r}: FloatList is float32 (lossy for "
                    "doubles); pass allow_float32=True to opt in"
                )
            packed = b"".join(struct.pack("<f", v) for v in vals)
            flist = _len_field(1, packed)
            feature = _len_field(2, flist)  # Feature.float_list = 2
        else:
            raise TypeError(f"feature {name!r}: unsupported {type(vals[0])}")
        entry = _len_field(1, name.encode("utf-8")) + _len_field(2, feature)
        entries.append(_len_field(1, entry))  # Features.feature map entry
    return _len_field(1, b"".join(entries))  # Example.features = 1


def decode_example(buf: bytes) -> dict:
    """Decode Example wire bytes into ``{name: list}`` (bytes stay bytes,
    ints are Python ints, floats are float32-exact Python floats)."""

    def fields(b: bytes) -> Iterator[tuple[int, int, bytes]]:
        pos = 0
        while pos < len(b):
            key, pos = _read_varint(b, pos)
            num, wt = key >> 3, key & 7
            if wt == 2:
                ln, pos = _read_varint(b, pos)
                yield num, wt, b[pos : pos + ln]
                pos += ln
            elif wt == 0:
                v, pos = _read_varint(b, pos)
                yield num, wt, _varint(v)
            elif wt == 5:
                yield num, wt, b[pos : pos + 4]
                pos += 4
            elif wt == 1:
                yield num, wt, b[pos : pos + 8]
                pos += 8
            else:  # pragma: no cover - groups, unused by Example
                raise ValueError(f"unsupported wire type {wt}")

    out: dict = {}
    for num, _, features_buf in fields(buf):
        if num != 1:
            continue
        for enum, _, entry in fields(features_buf):
            if enum != 1:
                continue
            name, vals = None, []
            for fnum, _, fval in fields(entry):
                if fnum == 1:
                    name = fval.decode("utf-8")
                elif fnum == 2:
                    for knum, _, lst in fields(fval):
                        for vnum, vwt, item in fields(lst):
                            if vnum != 1:
                                continue
                            if knum == 1:  # BytesList
                                vals.append(item)
                            elif knum == 3:  # Int64List (packed or not)
                                pos = 0
                                while pos < len(item):
                                    v, pos = _read_varint(item, pos)
                                    if v >= 1 << 63:
                                        v -= 1 << 64
                                    vals.append(v)
                            elif knum == 2:  # FloatList packed
                                for off in range(0, len(item), 4):
                                    vals.append(
                                        struct.unpack_from("<f", item, off)[0]
                                    )
            if name is not None:
                out[name] = vals
    return out


# -- record-level file IO -----------------------------------------------------


def write_tfrecord_file(path: str, payloads: Iterable[bytes]) -> tuple[int, int]:
    """Write framed records; returns (n_records, n_bytes)."""
    n = total = 0
    with open(path, "wb") as f:
        for payload in payloads:
            header = struct.pack("<Q", len(payload))
            rec = (
                header
                + struct.pack("<I", _masked_crc(header))
                + payload
                + struct.pack("<I", _masked_crc(payload))
            )
            f.write(rec)
            n += 1
            total += len(rec)
    return n, total


def read_tfrecord_file(path: str, *, verify: bool = True) -> Iterator[bytes]:
    """Iterate framed payloads, verifying both CRC words.

    Every read is length-checked IN ORDER (header CRC, payload, payload
    CRC) so a file truncated anywhere inside a frame raises ``EOFError``
    with the offending byte offset — never a bare ``struct.error`` from
    unpacking a short buffer, and never a CRC comparison against
    garbage (r8 ADVICE fix)."""
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                return
            if len(header) < 8:
                raise EOFError(
                    f"{path}: truncated length header at byte {f.tell() - len(header)}"
                )
            (length,) = struct.unpack("<Q", header)
            hcrc_raw = f.read(4)
            if len(hcrc_raw) < 4:
                raise EOFError(f"{path}: truncated header CRC at byte {f.tell()}")
            (hcrc,) = struct.unpack("<I", hcrc_raw)
            payload = f.read(length)
            if len(payload) < length:
                raise EOFError(
                    f"{path}: truncated payload at byte {f.tell()} "
                    f"(want {length}, got {len(payload)})"
                )
            pcrc_raw = f.read(4)
            if len(pcrc_raw) < 4:
                raise EOFError(f"{path}: truncated payload CRC at byte {f.tell()}")
            (pcrc,) = struct.unpack("<I", pcrc_raw)
            if verify and (
                hcrc != _masked_crc(header) or pcrc != _masked_crc(payload)
            ):
                raise ValueError(f"{path}: CRC mismatch (corrupt record)")
            yield payload


# -- Spark-side distributed write / read --------------------------------------


def write_tfrecords(df, path: str, *, allow_float32: bool = False):
    """Export a DataFrame to ``path/part-*.tfrecord`` of Example records,
    ONE FILE PER PARTITION (each task streams its rows straight to its
    own file — no shuffle, no driver funnel; repartition upstream to pick
    the file count). Returns the manifest DataFrame
    ``(file, n_records, n_bytes)`` — small (one row per file), so a
    downstream ``collect()`` on it is bounded by design."""
    import pandas as pd

    os.makedirs(path, exist_ok=True)
    cols = df.columns

    def _write(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        fname = os.path.join(path, f"part-{pid:05d}.tfrecord")
        # attempt-scoped temp + atomic rename: a retried or speculative
        # duplicate attempt never interleaves writes into the final path,
        # and a failed attempt leaves only a .tmp file that the reader's
        # *.tfrecord filter ignores (r8 ADVICE fix)
        tmp = f"{fname}.attempt-{ctx.taskAttemptId()}.tmp"

        def payloads():
            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    yield encode_example(
                        dict(zip(cols, row)), allow_float32=allow_float32
                    )

        n, total = write_tfrecord_file(tmp, payloads())
        os.replace(tmp, fname)
        yield pd.DataFrame(
            {"file": [fname], "n_records": [n], "n_bytes": [total]}
        )

    return df.mapInPandas(_write, "file string, n_records long, n_bytes long")


def read_tfrecords(spark, path: str, schema: dict):
    """Read ``path/*.tfrecord`` back into a DataFrame. ``schema`` maps
    feature name -> ``'long' | 'string' | 'binary'`` (scalar features).
    One task per file (the container's split unit)."""
    import pandas as pd

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".tfrecord")
    )
    names = list(schema)
    spark_schema = ", ".join(f"{n} {t}" for n, t in schema.items())

    def _read(batches):
        for pdf in batches:
            for fname in pdf["file"]:
                rows = []
                for payload in read_tfrecord_file(fname):
                    ex = decode_example(payload)
                    row = []
                    for n in names:
                        v = ex[n][0]
                        if schema[n] == "string" and isinstance(v, bytes):
                            v = v.decode("utf-8")
                        row.append(v)
                    rows.append(row)
                yield pd.DataFrame(rows, columns=names)

    fdf = spark.createDataFrame(
        [(f,) for f in files], "file string"
    ).repartition(max(len(files), 1))
    return fdf.mapInPandas(_read, spark_schema)
