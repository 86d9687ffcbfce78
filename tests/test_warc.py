"""WARC/WET ingestion (sources/warc.py): spec-exact framing, gzip
auto-detect, type filtering, and the Spark one-task-per-file scan."""

import gzip

import pytest

from samza_spark.sources.warc import (
    header,
    iter_warc_records,
    read_warc,
    wet_to_documents,
    write_warc_file,
)


def _recs():
    return [
        {
            "headers": {
                "WARC-Type": "warcinfo",
                "WARC-Record-ID": "<urn:uuid:0>",
                "Content-Type": "application/warc-fields",
            },
            "payload": b"software: samza-spark\r\n",
        },
        {
            "headers": {
                "WARC-Record-ID": "<urn:uuid:1>",
                "WARC-Target-URI": "http://a.example/page",
                "WARC-Date": "2024-01-01T00:00:00Z",
                "Content-Type": "text/plain",
            },
            "payload": "héllo crawl\ntwo lines".encode(),
        },
    ]


def test_roundtrip_plain_and_gzip(tmp_path):
    for compress, name in [(False, "a.warc"), (True, "a.warc.gz")]:
        p = str(tmp_path / name)
        assert write_warc_file(p, _recs(), compress=compress) == 2
        got = list(iter_warc_records(open(p, "rb").read()))
        assert len(got) == 2
        hdrs, payload = got[1]
        assert header(hdrs, "warc-target-uri") == "http://a.example/page"
        assert header(hdrs, "WARC-Type") == "conversion"  # WET default
        assert payload == "héllo crawl\ntwo lines".encode()


def test_framing_is_spec_exact(tmp_path):
    p = str(tmp_path / "b.warc")
    write_warc_file(p, [{"headers": {"WARC-Record-ID": "<r1>"}, "payload": b"xy"}])
    raw = open(p, "rb").read()
    assert raw.startswith(b"WARC/1.0\r\n")
    assert b"Content-Length: 2\r\n" in raw
    assert raw.endswith(b"xy\r\n\r\n")


def test_truncated_payload_raises(tmp_path):
    p = str(tmp_path / "c.warc")
    write_warc_file(p, [{"headers": {}, "payload": b"abcdef"}])
    blob = open(p, "rb").read()[:-6]  # cut into the payload
    with pytest.raises(EOFError):
        list(iter_warc_records(blob))


def test_multi_member_gzip_concatenation(tmp_path):
    # Common Crawl writes one gzip member per record; concatenated
    # members must decompress as one stream
    p = str(tmp_path / "d.wet.gz")
    import io

    from samza_spark.sources.warc import CRLF

    out = io.BytesIO()
    for rec in _recs():
        one = io.BytesIO()
        payload = rec["payload"]
        hdrs = dict(rec["headers"])
        hdrs.setdefault("WARC-Type", "conversion")
        hdrs["Content-Length"] = str(len(payload))
        one.write(b"WARC/1.0" + CRLF)
        for k, v in hdrs.items():
            one.write(f"{k}: {v}".encode() + CRLF)
        one.write(CRLF + payload + CRLF + CRLF)
        out.write(gzip.compress(one.getvalue()))
    open(p, "wb").write(out.getvalue())
    assert len(list(iter_warc_records(open(p, "rb").read()))) == 2


def test_spark_scan_and_wet_projection(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    for i, compress in [(0, False), (1, True)]:
        recs = [
            {
                "headers": {
                    "WARC-Record-ID": f"<urn:uuid:{i}-{j}>",
                    "WARC-Target-URI": f"http://s{i}.example/{j}",
                    "WARC-Date": "2024-01-01T00:00:00Z",
                    "Content-Type": "text/plain",
                },
                "payload": f"doc {i}-{j} body".encode(),
            }
            for j in range(3)
        ] + [
            {
                "headers": {"WARC-Type": "warcinfo"},
                "payload": b"software: x",
            }
        ]
        fname = f"part-{i}.warc" + (".gz" if compress else "")
        write_warc_file(str(d / fname), recs, compress=compress)

    df = read_warc(spark, str(d))
    assert df.count() == 8
    conv = read_warc(spark, str(d), types=("conversion",))
    assert conv.count() == 6

    docs = wet_to_documents(read_warc(spark, str(d)))
    rows = {r["record_id"]: r for r in docs.collect()}
    assert len(rows) == 6
    r = rows["<urn:uuid:1-2>"]
    assert r["text"] == "doc 1-2 body"
    assert r["target_uri"] == "http://s1.example/2"
    assert r["n_chars"] == len("doc 1-2 body")


def test_member_per_record_gzip_layout(tmp_path):
    """r8 ADVICE: compressed WET defaults to Common Crawl's
    member-per-record layout — each record its own gzip member, so
    archives re-split at byte-level member boundaries."""
    from samza_spark.sources.warc import iter_warc_records, write_warc_file

    recs = [
        {"headers": {"WARC-Record-ID": f"id{i}"}, "payload": f"t{i}".encode()}
        for i in range(3)
    ]
    p = tmp_path / "m.wet.gz"
    write_warc_file(str(p), recs, compress=True)
    blob = p.read_bytes()
    # one gzip magic per record (deterministic mtime=0 framing)
    assert blob.count(b"\x1f\x8b\x08") == 3
    got = list(iter_warc_records(blob))
    assert [h["WARC-Record-ID"] for h, _ in got] == ["id0", "id1", "id2"]
    # single-member mode still roundtrips
    p1 = tmp_path / "s.wet.gz"
    write_warc_file(str(p1), recs, compress=True, member_per_record=False)
    assert p1.read_bytes().count(b"\x1f\x8b\x08") == 1
    assert len(list(iter_warc_records(p1.read_bytes()))) == 3
