"""Avro without the spark-avro jar: pure-Python OCF codec (spec-compliance
golden bytes, round trips, codecs), DataFrame read/write integration, and
reference-shaped schema conversion fixtures (AvroRelConverter.java:63-158
feature coverage)."""

import datetime as dt
import io
import json

import pytest
from pyspark.sql import Row, types as T

from samza_spark.formats.avro_py import (
    read_avro,
    read_ocf,
    spark_to_avro_schema,
    write_avro,
    write_ocf,
)
from samza_spark.schema import avro_to_struct


RICH_SCHEMA = {
    "type": "record",
    "name": "Profile",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "active", "type": "boolean"},
        {"name": "blob", "type": "bytes"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {
            "name": "address",
            "type": {
                "type": "record",
                "name": "Address",
                "fields": [
                    {"name": "zip", "type": "int"},
                    {"name": "street", "type": ["null", "string"]},
                ],
            },
        },
        {
            "name": "kind",
            "type": {"type": "enum", "name": "Kind", "symbols": ["FREE", "PAID"]},
        },
        {"name": "sig", "type": {"type": "fixed", "name": "Sig", "size": 4}},
    ],
}

RICH_ROWS = [
    {
        "id": 1,
        "name": "ann",
        "score": 1.5,
        "active": True,
        "blob": b"\x00\x01",
        "tags": ["a", "b"],
        "attrs": {"k1": 7, "k2": -3},
        "address": {"zip": 94110, "street": "mission"},
        "kind": "PAID",
        "sig": b"abcd",
    },
    {
        "id": -2,
        "name": None,
        "score": -0.25,
        "active": False,
        "blob": b"",
        "tags": [],
        "attrs": {},
        "address": {"zip": 10001, "street": None},
        "kind": "FREE",
        "sig": b"\x00\x00\x00\x00",
    },
]


def test_binary_encoding_golden_bytes():
    """Spec compliance against hand-computed bytes: zigzag varints, length-
    prefixed strings, array terminator (Avro spec 'Binary encoding')."""
    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
            {"name": "c", "type": {"type": "array", "items": "int"}},
        ],
    }
    from samza_spark.formats.avro_py import _encode

    out = io.BytesIO()
    _encode(out, schema, {"a": 3, "b": "hi", "c": [1, -1]})
    # zigzag(3)=6; "hi" -> len 2 = zigzag 4 then bytes; array: count 2
    # (zigzag 4), items zigzag(1)=2, zigzag(-1)=1, terminator 0
    assert out.getvalue() == b"\x06" + b"\x04hi" + b"\x04\x02\x01\x00"
    # large varint: zigzag(64) = 128 -> 2-byte varint 0x80 0x01
    out2 = io.BytesIO()
    _encode(out2, "long", 64)
    assert out2.getvalue() == b"\x80\x01"


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_round_trip(codec):
    buf = io.BytesIO()
    write_ocf(buf, RICH_SCHEMA, RICH_ROWS, codec=codec, block_rows=1)  # multi-block
    got = list(read_ocf(buf.getvalue()))
    assert got == RICH_ROWS


def test_ocf_corruption_detected():
    buf = io.BytesIO()
    write_ocf(buf, RICH_SCHEMA, RICH_ROWS)
    blob = bytearray(buf.getvalue())
    blob[-1] ^= 0xFF  # clobber the trailing sync marker
    with pytest.raises(ValueError, match="sync marker"):
        list(read_ocf(bytes(blob)))


def test_logical_types_round_trip():
    schema = {
        "type": "record",
        "name": "L",
        "fields": [
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "tm", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        ],
    }
    from samza_spark.formats.avro_py import _decode, _encode

    out = io.BytesIO()
    _encode(out, schema, {"d": 19723, "tm": 1_704_067_200_000_000})
    got = _decode(io.BytesIO(out.getvalue()), schema)
    assert got["d"] == dt.date(2024, 1, 1)
    # timestamps decode tz-AWARE (avro timestamps are UTC instants)
    assert got["tm"] == dt.datetime(2024, 1, 1, 0, 0, 0, tzinfo=dt.timezone.utc)
    # and python date/datetime values ENCODE through the logical types too
    out2 = io.BytesIO()
    _encode(
        out2,
        schema,
        {"d": dt.date(2024, 1, 1), "tm": dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)},
    )
    assert out2.getvalue() == out.getvalue()


def test_null_through_non_nullable_branch_raises():
    schema = {
        "type": "record",
        "name": "N",
        "fields": [{"name": "s", "type": "string"}],
    }
    from samza_spark.formats.avro_py import _encode

    with pytest.raises(ValueError, match="non-nullable"):
        _encode(io.BytesIO(), schema, {"s": None})


def test_dataframe_date_timestamp_round_trip(spark, tmp_path):
    """write_avro on a DataFrame with date/timestamp columns must encode
    via the logical types (it used to crash on int(datetime)) and read
    back the same instants."""
    df = spark.createDataFrame(
        [
            (1, dt.date(2024, 1, 1), dt.datetime(2024, 1, 1, 12, 30, 0)),
            (2, dt.date(1969, 12, 31), dt.datetime(1970, 1, 1, 0, 0, 1)),
        ],
        "id int, d date, ts timestamp",
    )
    path = str(tmp_path / "avro_dt")
    write_avro(df, path)
    back = read_avro(spark, path)
    got = {r.id: (r.d, r.ts) for r in back.collect()}
    want = {r.id: (r.d, r.ts) for r in df.collect()}
    assert got == want


def test_filesink_fallback_honors_mode_and_rejects_partition_by(spark, tmp_path):
    from samza_spark.sources import FileSink, FileSource

    df1 = spark.createDataFrame([(1, "x")], "id int, v string")
    df2 = spark.createDataFrame([(2, "y")], "id int, v string")
    path = str(tmp_path / "avro_modes")
    FileSink(path, fmt="avro").write(df1)
    # overwrite must CLEAR stale part files, not mix them in
    FileSink(path, fmt="avro", mode="overwrite").write(df2)
    got = sorted((r.id, r.v) for r in FileSource(path, fmt="avro").read(spark).df.collect())
    assert got == [(2, "y")]
    with pytest.raises(FileExistsError):
        FileSink(path, fmt="avro", mode="errorifexists").write(df1)
    # ignore on existing target is a no-op
    FileSink(path, fmt="avro", mode="ignore").write(df1)
    got = sorted((r.id, r.v) for r in FileSource(path, fmt="avro").read(spark).df.collect())
    assert got == [(2, "y")]
    with pytest.raises(NotImplementedError, match="partition_by"):
        FileSink(str(tmp_path / "p"), fmt="avro", partition_by=["v"]).write(df1)


def test_dataframe_avro_round_trip(spark, tmp_path):
    """write_avro (one OCF per partition, executor-side) -> read_avro
    (binaryFile + mapInPandas decode) round-trips data and types,
    including nested struct / array / map / nullable."""
    df = spark.createDataFrame(
        [
            (1, "a", [1, 2], {"x": 1.5}, Row(zip=94110, street="mission"), None),
            (2, None, [], {}, Row(zip=10001, street=None), 3.5),
        ],
        "id bigint, name string, xs array<int>, m map<string,double>, "
        "addr struct<zip:int,street:string>, opt double",
    ).repartition(3)
    path = str(tmp_path / "avro_rt")
    schema_used = write_avro(df, path)
    assert schema_used["type"] == "record"
    back = read_avro(spark, path)
    assert back.schema == avro_to_struct(schema_used)
    got = sorted(
        ((r.id, r.name, r.xs, r.m, (r.addr.zip, r.addr.street), r.opt) for r in back.collect())
    )
    assert got == [
        (1, "a", [1, 2], {"x": 1.5}, (94110, "mission"), None),
        (2, None, [], {}, (10001, None), 3.5),
    ]


def test_filesource_filesink_avro_fallback(spark, tmp_path):
    """FileSink/FileSource fmt='avro' work end-to-end without the
    spark-avro jar via the OCF fallback; streaming avro still raises with
    guidance (the jar is genuinely required for readStream)."""
    from samza_spark.sources import FileSink, FileSource

    df = spark.createDataFrame([(1, "x"), (2, "y")], "id int, v string")
    path = str(tmp_path / "avro_sink")
    FileSink(path, fmt="avro").write(df)
    back = FileSource(path, fmt="avro").read(spark).df
    assert sorted((r.id, r.v) for r in back.collect()) == [(1, "x"), (2, "y")]
    with pytest.raises(NotImplementedError, match="spark-avro"):
        FileSource(path, fmt="avro", schema="id int, v string").read_stream(spark)


def test_reference_shaped_schema_fixtures():
    """avro_to_struct over the schema features the reference's converter
    handles (AvroRelConverter.java:63-158): nested records, nullable
    unions, multi-branch unions (tagged struct), maps, arrays, enums ->
    string, fixed -> bytes, decimal/timestamp logical types."""
    st = avro_to_struct(RICH_SCHEMA)
    assert st["name"].dataType == T.StringType() and st["name"].nullable
    assert st["tags"].dataType == T.ArrayType(T.StringType(), False)
    assert st["attrs"].dataType == T.MapType(T.StringType(), T.LongType(), False)
    assert isinstance(st["address"].dataType, T.StructType)
    assert st["address"].dataType["street"].nullable
    assert st["kind"].dataType == T.StringType()  # enum -> string
    assert st["sig"].dataType == T.BinaryType()  # fixed -> bytes

    multi_union = {
        "type": "record",
        "name": "U",
        "fields": [{"name": "val", "type": ["null", "string", "long"]}],
    }
    ust = avro_to_struct(multi_union)
    assert isinstance(ust["val"].dataType, T.StructType)  # tagged struct
    assert {f.name for f in ust["val"].dataType.fields} == {
        "member_string",
        "member_long",
    }

    logical = {
        "type": "record",
        "name": "LT",
        "fields": [
            {
                "name": "price",
                "type": {"type": "bytes", "logicalType": "decimal", "precision": 12, "scale": 2},
            },
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-millis"}},
            {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        ],
    }
    lst = avro_to_struct(logical)
    assert lst["price"].dataType == T.DecimalType(12, 2)
    assert lst["ts"].dataType == T.TimestampType()
    assert lst["day"].dataType == T.DateType()


def test_spark_to_avro_derivation_round_trips_through_converter():
    """spark_to_avro_schema o avro_to_struct is identity on the supported
    lattice (modulo nullability defaults on containers)."""
    st = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("xs", T.ArrayType(T.IntegerType(), False), False),
            T.StructField(
                "addr",
                T.StructType([T.StructField("zip", T.IntegerType(), False)]),
                False,
            ),
        ]
    )
    avro = spark_to_avro_schema(st, "topLevelRecord")
    assert json.dumps(avro)  # serializable
    assert avro_to_struct(avro) == st


def test_azure_blob_avro_sink_local_path(spark, tmp_path):
    """AzureBlobAvroWriter analog: deflate Avro container blobs, one per
    partition, rolled over at max_records_per_blob — readable back through
    the jar-less codec."""
    import glob

    from samza_spark.sources import AzureBlobAvroSink

    df = spark.range(10).selectExpr("id", "concat('v', id) AS v").repartition(2)
    path = str(tmp_path / "blobs")
    AzureBlobAvroSink(path, max_records_per_blob=3).write(df)
    blobs = glob.glob(f"{path}/blob-*.avro")
    assert len(blobs) >= 4  # 2 partitions x ceil(5/3) rollover
    back = read_avro(spark, path)
    assert sorted((r.id, r.v) for r in back.collect()) == [
        (i, f"v{i}") for i in range(10)
    ]


def test_couchbase_table_fake_client_and_gate(spark):
    """CouchbaseTableReadFunction analog: injected client drives the
    shared rate-limit/retry/batch enrich path; without a client the
    optional SDK gate raises with guidance."""
    from samza_spark.tables.remote import CouchbaseTable

    class FakeBucket:
        def __init__(self):
            self.calls = 0

        def get_multi(self, keys):
            self.calls += 1
            return {k: {"name": f"user{k}"} for k in keys if k % 2 == 0}

    fb = FakeBucket()
    t = CouchbaseTable("users", "uid", "name string", client=fb, max_batch=2)
    df = spark.createDataFrame([(i,) for i in range(6)], "uid int").coalesce(1)
    got = sorted((r.uid, r.name) for r in t.enrich(df, how="inner").collect())
    assert got == [(0, "user0"), (2, "user2"), (4, "user4")]
    left = t.enrich(df, how="left").count()
    assert left == 6
    with pytest.raises(NotImplementedError, match="couchbase"):
        CouchbaseTable("users", "uid", "name string")


# ---------------------------------------------------------------------------
# Kinesis injectable-client source (KinesisSystemConsumer wire contract)
# ---------------------------------------------------------------------------


class _FakeKinesis:
    def __init__(self):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        self._shards = {
            "shardId-000": [
                {"sequence_number": 101, "partition_key": "a", "data": b"m1",
                 "approximate_arrival": t0},
                {"sequence_number": 102, "partition_key": "b", "data": b"m2",
                 "approximate_arrival": t0},
            ],
            "shardId-001": [
                {"sequence_number": 555, "partition_key": "c", "data": b"m3",
                 "approximate_arrival": t0},
            ],
        }

    def list_shards(self, stream):
        return sorted(self._shards)

    def get_records(self, stream, shard_id):
        return iter(self._shards[shard_id])


def test_kinesis_fake_client_wire_contract(spark, tmp_path):
    from samza_spark.sources.descriptors import KinesisSource

    src = KinesisSource(
        stream="events", client=_FakeKinesis(), spool_dir=str(tmp_path / "kin")
    )
    batch = src.read(spark).df
    assert batch.count() == 3
    wire = KinesisSource.as_kafka_wire(batch)
    rows = {(r.partition, r.offset): r for r in wire.collect()}
    assert set(rows) == {(0, 0), (0, 1), (1, 0)}
    assert rows[(0, 0)]["__key__"] == "a" and rows[(0, 0)].value == b"m1"
    assert rows[(1, 0)].value == b"m3" and rows[(1, 0)].topic == "events"
    # streaming path drains the same spool
    stream_df = src.read_stream(spark).df
    assert stream_df.isStreaming


def test_kinesis_real_size_sequence_numbers_and_spool_once(spark, tmp_path):
    # real Kinesis sequence numbers are ~56-digit integers: decimal(38,0)
    # overflowed them to NULL and scrambled offset assignment. Also:
    # read() + read_stream() on one descriptor must share ONE spool drain
    # (append into a fixed spool_dir used to duplicate every record).
    import datetime as dt

    from samza_spark.sources.descriptors import KinesisSource

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    big = 49_590_338_271_490_256_608_559_692_538_361_571_095_921_575_989_136_588_898
    client = _FakeKinesis()
    client._shards = {
        "shardId-000": [
            {"sequence_number": big + 10, "partition_key": "y", "data": b"m2",
             "approximate_arrival": t0},
            {"sequence_number": big, "partition_key": "x", "data": b"m1",
             "approximate_arrival": t0},
            # shorter string but numerically between the others if compared
            # lexicographically-with-padding wrong; also exercises mixed length
            {"sequence_number": 7, "partition_key": "z", "data": b"m0",
             "approximate_arrival": t0},
        ],
    }
    src = KinesisSource(
        stream="events", client=client, spool_dir=str(tmp_path / "kin2")
    )
    batch = src.read(spark).df
    assert batch.count() == 3
    wire = KinesisSource.as_kafka_wire(batch)
    by_offset = {r.offset: r for r in wire.collect()}
    # numeric order: 7 < big < big+10
    assert by_offset[0].value == b"m0"
    assert by_offset[1].value == b"m1"
    assert by_offset[2].value == b"m2"
    # second read reuses the first drain — still 3 records, not 6
    assert src.read(spark).df.count() == 3
    assert src.read_stream(spark).df.isStreaming


def test_kinesis_without_client_raises(spark):
    from samza_spark.sources.descriptors import KinesisSource

    with pytest.raises(NotImplementedError, match="Kinesis"):
        KinesisSource(stream="s").read_stream(spark)


def test_multi_branch_union_type_matched_round_trip(spark):
    """``["null","long","string"]`` union: values are written under the
    branch whose TYPE matches (AvroRelConverter.java:81-158 semantics) and
    read back as the §7.3 tagged struct — r5's first-non-null pick would
    have encoded strings under the long branch."""
    from samza_spark.formats.avro_py import read_avro, read_ocf, write_ocf

    schema = {
        "type": "record",
        "name": "U",
        "fields": [{"name": "val", "type": ["null", "long", "string"]}],
    }
    rows = [{"val": 5}, {"val": "five"}, {"val": None}, {"val": -9}]
    buf = io.BytesIO()
    write_ocf(buf, schema, rows)
    got = list(read_ocf(buf.getvalue()))
    assert got == [
        {"val": {"member_long": 5, "member_string": None}},
        {"val": {"member_long": None, "member_string": "five"}},
        {"val": None},
        {"val": {"member_long": -9, "member_string": None}},
    ]
    # tagged-struct values (the Spark row shape) encode equivalently
    buf2 = io.BytesIO()
    write_ocf(buf2, schema, got)
    assert list(read_ocf(buf2.getvalue())) == got


def test_multi_branch_union_reads_into_spark(spark, tmp_path):
    from samza_spark.formats.avro_py import read_avro, write_ocf

    schema = {
        "type": "record",
        "name": "U",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "val", "type": ["null", "long", "string"]},
        ],
    }
    p = tmp_path / "u.avro"
    with open(p, "wb") as f:
        write_ocf(f, schema, [{"id": 1, "val": 7}, {"id": 2, "val": "x"}, {"id": 3, "val": None}])
    df = read_avro(spark, str(tmp_path), schema)
    got = {r["id"]: r["val"] for r in df.collect()}
    assert got[1]["member_long"] == 7 and got[1]["member_string"] is None
    assert got[2]["member_string"] == "x" and got[2]["member_long"] is None
    assert got[3] is None
