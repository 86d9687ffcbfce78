"""TFRecord container + hand-rolled Example codec (formats/tfrecord.py):
wire-format golden bytes, CRC check vectors, framing corruption
detection, and the distributed Spark write/read roundtrip."""

import struct

import pytest

from samza_spark.formats.tfrecord import (
    _masked_crc,
    crc32c,
    decode_example,
    encode_example,
    read_tfrecord_file,
    read_tfrecords,
    write_tfrecord_file,
    write_tfrecords,
)


def test_crc32c_check_vectors():
    # the standard CRC32C check value + identities
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA  # RFC 3720 test vector


def test_masked_crc_formula():
    c = crc32c(b"123456789")
    assert _masked_crc(b"123456789") == (
        ((c >> 15) | (c << 17)) + 0xA282EAD8
    ) & 0xFFFFFFFF


def test_example_golden_bytes_int64():
    # hand-assembled from the proto wire spec: Example{features{feature{
    # key:"id" value{int64_list{value:[5]}}}}}
    assert encode_example({"id": 5}) == b"\n\r\n\x0b\n\x02id\x12\x05\x1a\x03\n\x01\x05"


def test_example_roundtrip_kinds():
    ex = {
        "doc_id": 1234567890123,
        "neg": -7,
        "text": "héllo\nworld",
        "raw": b"\x00\xff\x10",
        "ids": [1, 2, 3],
    }
    got = decode_example(encode_example(ex))
    assert got["doc_id"] == [1234567890123]
    assert got["neg"] == [-7]
    assert got["text"] == ["héllo\nworld".encode()]
    assert got["raw"] == [b"\x00\xff\x10"]
    assert got["ids"] == [1, 2, 3]


def test_float32_requires_opt_in():
    with pytest.raises(TypeError, match="float32"):
        encode_example({"score": 0.5})
    got = decode_example(encode_example({"score": 0.5}, allow_float32=True))
    assert got["score"] == [0.5]  # 0.5 is exact in float32


def test_file_roundtrip_and_corruption(tmp_path):
    path = str(tmp_path / "a.tfrecord")
    payloads = [b"one", b"two" * 100, b""]
    n, total = write_tfrecord_file(path, payloads)
    assert n == 3
    assert list(read_tfrecord_file(path)) == payloads

    # flip one payload byte -> CRC must catch it
    data = bytearray(open(path, "rb").read())
    data[12] ^= 0xFF  # first payload byte (8 len + 4 crc)
    open(path, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="CRC"):
        list(read_tfrecord_file(path))


def test_spark_write_read_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"text-{i}é", f"src{i % 3}") for i in range(50)],
        "doc_id long, text string, source string",
    ).repartition(4)
    out = str(tmp_path / "tfr")
    manifest = write_tfrecords(df, out).collect()
    assert sum(r["n_records"] for r in manifest) == 50
    assert len(manifest) == 4  # one file per partition

    back = read_tfrecords(
        spark, out, {"doc_id": "long", "text": "string", "source": "string"}
    )
    rows = {r["doc_id"]: (r["text"], r["source"]) for r in back.collect()}
    assert len(rows) == 50
    assert rows[7] == ("text-7é", "src1")


def test_framing_layout_is_spec_exact(tmp_path):
    # length LE uint64 | masked crc of length | payload | masked crc of payload
    path = str(tmp_path / "b.tfrecord")
    write_tfrecord_file(path, [b"abc"])
    raw = open(path, "rb").read()
    header = struct.pack("<Q", 3)
    assert raw[:8] == header
    assert struct.unpack("<I", raw[8:12])[0] == _masked_crc(header)
    assert raw[12:15] == b"abc"
    assert struct.unpack("<I", raw[15:19])[0] == _masked_crc(b"abc")


def test_truncation_inside_crc_words_raises_eoferror(tmp_path):
    """r8 ADVICE: a file cut anywhere inside a frame — header CRC,
    payload, or payload CRC — must raise EOFError with a position, never
    struct.error from unpacking a short buffer."""
    import pytest
    from samza_spark.formats.tfrecord import (
        read_tfrecord_file,
        write_tfrecord_file,
    )

    full = tmp_path / "full.tfrecord"
    write_tfrecord_file(str(full), [b"payload-bytes-here"])
    blob = full.read_bytes()
    # cut points: inside header CRC (9), inside payload (14),
    # inside payload CRC (len-2)
    for cut in (9, 14, len(blob) - 2):
        p = tmp_path / f"cut{cut}.tfrecord"
        p.write_bytes(blob[:cut])
        with pytest.raises(EOFError) as ei:
            list(read_tfrecord_file(str(p)))
        assert "byte" in str(ei.value)
