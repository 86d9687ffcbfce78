"""WARC / WET web-archive ingestion (the Common Crawl shape).

WARC is a PUBLIC format (ISO 28500; the WARC 1.1 spec and Common
Crawl's docs): a file is a sequence of records, each a header block of
``Name: value`` lines ending at a blank line, then exactly
``Content-Length`` payload bytes, then ``\\r\\n\\r\\n``. Common Crawl's
WET files are WARC files whose records are ``WARC-Type: conversion``
with extracted-plain-text payloads — the standard raw input of an LLM
text pipeline.

Reference parity: the reference ingests directory-of-files systems
through partition-per-file descriptors
(samza-hdfs/.../HdfsSystemConsumer.java:71-103 — one SSP per file);
``read_warc`` keeps that contract: one task per archive file, which is
also the only safe split (WARC has no intra-file sync markers; gzipped
WET is a stream of per-record gzip members, splittable only at member
boundaries the file system can't see).

Scale notes: the file manifest is the parallelism unit — at 100 TB the
listing itself is a DataFrame (``spark.read.format('binaryFile')`` scan
keeps listing distributed); payloads stream record-at-a-time off the
Arrow batches, never materializing a whole archive in memory beyond one
record. Decompression is per-file gzip (honest Python ``gzip``; WARC's
member-per-record layout means a future member-boundary index could
split large files, the same trade documented for OCF blocks in
formats/avro_py.py).
"""

from __future__ import annotations

import gzip
import io
import os
from collections.abc import Iterator

CRLF = b"\r\n"


def _frame(rec: dict) -> bytes:
    """One WARC record frame: version line, headers, blank line, payload,
    record terminator."""
    payload = rec["payload"]
    headers = dict(rec.get("headers") or {})
    headers.setdefault("WARC-Type", "conversion")
    headers["Content-Length"] = str(len(payload))
    out = io.BytesIO()
    out.write(b"WARC/1.0" + CRLF)
    for k, v in headers.items():
        out.write(f"{k}: {v}".encode() + CRLF)
    out.write(CRLF)
    out.write(payload)
    out.write(CRLF + CRLF)
    return out.getvalue()


def write_warc_file(
    path: str,
    records: "Iterator[dict] | list[dict]",
    *,
    compress: bool = False,
    member_per_record: bool = True,
) -> int:
    """Write WARC records: each ``record`` is ``{"headers": {name: value},
    "payload": bytes}``; ``WARC-Type`` defaults to ``conversion`` (WET)
    and ``Content-Length`` is computed. Returns the record count.

    Records STREAM to the output file one frame at a time — memory is
    bounded by a single record regardless of partition size (r8 ADVICE
    fix: the old path buffered the whole partition in one BytesIO and
    gzip-compressed it at once). With ``compress=True`` the default is
    Common Crawl's member-per-record gzip layout (one gzip member per
    WARC record, deterministic ``mtime=0``), which is what makes large
    archives splittable at member boundaries; ``member_per_record=False``
    writes a single streamed member for maximum ratio."""
    n = 0
    with open(path, "wb") as f:
        if compress and member_per_record:
            for rec in records:
                f.write(gzip.compress(_frame(rec), mtime=0))
                n += 1
        elif compress:
            with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
                for rec in records:
                    gz.write(_frame(rec))
                    n += 1
        else:
            for rec in records:
                f.write(_frame(rec))
                n += 1
    return n


def iter_warc_records(blob: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(headers, payload)`` from WARC bytes (gzip auto-detected
    by magic). Header names are returned case-preserved; look up with
    :func:`header` for case-insensitive access."""
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)
    buf = io.BytesIO(blob)
    while True:
        line = buf.readline()
        if not line:
            return
        if line.strip() == b"":  # inter-record padding
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line, got {line[:40]!r}")
        headers: dict = {}
        while True:
            line = buf.readline()
            if line in (CRLF, b"\n", b""):
                break
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip()] = v.strip()
        length = int(header(headers, "Content-Length") or 0)
        payload = buf.read(length)
        if len(payload) < length:
            raise EOFError("truncated WARC payload")
        yield headers, payload


def header(headers: dict, name: str) -> "str | None":
    lname = name.lower()
    for k, v in headers.items():
        if k.lower() == lname:
            return v
    return None


WARC_SCHEMA = (
    "file string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, payload binary"
)


def read_warc(spark, path: str, *, types: "tuple[str, ...] | None" = None):
    """Scan ``path`` (a file, directory, or glob of ``.warc[.gz]`` /
    ``.wet[.gz]`` files) into a DataFrame of records — one task per
    file. ``types`` filters on ``WARC-Type`` executor-side (so a
    'conversion'-only read never deserializes response payload rows into
    Arrow batches).

    Size cap: ``binaryFile`` materializes each archive as one row, so a
    single file must fit executor memory and stay under Spark's ~2 GiB
    byte-array limit — Common Crawl's ~1 GiB-gzipped segment convention
    is inside that; shard anything larger upstream (the write path's
    member-per-record layout keeps re-sharding a pure byte-level split)."""
    import pandas as pd

    if os.path.isdir(path):
        path = os.path.join(path, "*")
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def _parse(batches):
        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                rows = []
                for hdrs, payload in iter_warc_records(bytes(blob)):
                    wtype = header(hdrs, "WARC-Type") or ""
                    if types and wtype not in types:
                        continue
                    rows.append(
                        (
                            fpath,
                            header(hdrs, "WARC-Record-ID") or "",
                            wtype,
                            header(hdrs, "WARC-Target-URI") or "",
                            header(hdrs, "WARC-Date") or "",
                            header(hdrs, "Content-Type") or "",
                            payload,
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "file",
                        "record_id",
                        "warc_type",
                        "target_uri",
                        "warc_date",
                        "content_type",
                        "payload",
                    ],
                )

    return files.mapInPandas(_parse, WARC_SCHEMA)


def write_wet(df, path: str, *, uri_col: str = "target_uri",
              id_col: str = "record_id", text_col: str = "text",
              compress: bool = True):
    """Distributed WET export: one ``part-*.wet[.gz]`` file per partition
    via ``mapInPandas`` (no shuffle, no driver funnel — repartition
    upstream to pick the archive count, the same contract as
    formats/tfrecord.write_tfrecords). Returns the manifest DataFrame
    ``(file, n_records)``."""
    import pandas as pd

    os.makedirs(path, exist_ok=True)
    ext = ".wet.gz" if compress else ".wet"

    def _write(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        fname = os.path.join(path, f"part-{pid:05d}{ext}")
        # attempt-scoped temp + atomic rename (same commit discipline as
        # formats/tfrecord.write_tfrecords): retries/speculative attempts
        # never interleave into the final path (r8 ADVICE fix)
        tmp = f"{fname}.attempt-{ctx.taskAttemptId()}.tmp"

        def records():
            for pdf in batches:
                for rid, uri, text in zip(
                    pdf[id_col], pdf[uri_col], pdf[text_col]
                ):
                    yield {
                        "headers": {
                            "WARC-Type": "conversion",
                            "WARC-Record-ID": str(rid),
                            "WARC-Target-URI": str(uri),
                            "Content-Type": "text/plain",
                        },
                        "payload": str(text).encode("utf-8"),
                    }

        n = write_warc_file(tmp, records(), compress=compress)
        os.replace(tmp, fname)
        yield pd.DataFrame({"file": [fname], "n_records": [n]})

    return df.mapInPandas(_write, "file string, n_records long")


def wet_to_documents(warc_df):
    """Project WET conversion records into the ``documents``-table shape
    (text decoded as utf-8, URI kept as source key) — the first hop of a
    crawl -> corpus pipeline. Pure Catalyst projection; the n_chars stat
    comes from the decoded text, not the byte length."""
    from pyspark.sql import functions as F

    return (
        warc_df.filter(F.col("warc_type") == "conversion")
        .select(
            F.col("record_id"),
            F.col("target_uri"),
            F.col("payload").cast("string").alias("text"),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )
