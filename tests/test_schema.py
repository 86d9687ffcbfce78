"""Schema conversion: Avro-style -> StructType (SURVEY.md §1.2-1.3;
mirrors AvroRelConverter/RelSchemaConverter coverage incl. nested records,
arrays, maps, unions, fixed, enum — TestAvroRelConversion shapes)."""

import pytest
from pyspark.sql import types as T

from samza_spark.schema import avro_to_spark_type, avro_to_struct, ddl_to_struct


PROFILE_AVSC = {
    "type": "record",
    "name": "Profile",
    "fields": [
        {"name": "id", "type": "int"},
        {"name": "name", "type": ["null", "string"]},
        {
            "name": "address",
            "type": {
                "type": "record",
                "name": "Address",
                "fields": [
                    {"name": "zip", "type": "int"},
                    {
                        "name": "streetnum",
                        "type": {
                            "type": "record",
                            "name": "StreetNum",
                            "fields": [{"name": "number", "type": "int"}],
                        },
                    },
                ],
            },
        },
        {
            "name": "phoneNumbers",
            "type": {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": "Phone",
                    "fields": [
                        {"name": "kind", "type": {"type": "enum", "name": "Kind", "symbols": ["Home", "Work", "Cell"]}},
                        {"name": "number", "type": "string"},
                    ],
                },
            },
        },
        {"name": "mapValues", "type": {"type": "map", "values": "string"}},
        {"name": "fixed_value", "type": {"type": "fixed", "name": "MyFixed", "size": 16}},
    ],
}


def test_profile_schema():
    st = avro_to_struct(PROFILE_AVSC)
    assert st["id"].dataType == T.IntegerType()
    assert st["name"].nullable
    assert isinstance(st["address"].dataType, T.StructType)
    assert st["address"].dataType["streetnum"].dataType["number"].dataType == T.IntegerType()
    phones = st["phoneNumbers"].dataType
    assert isinstance(phones, T.ArrayType)
    assert phones.elementType["kind"].dataType == T.StringType()  # enum -> string
    mv = st["mapValues"].dataType
    assert isinstance(mv, T.MapType) and mv.keyType == T.StringType()
    assert st["fixed_value"].dataType == T.BinaryType()


def test_primitive_and_logical_types():
    assert avro_to_spark_type("long") == T.LongType()
    assert avro_to_spark_type({"type": "long", "logicalType": "timestamp-millis"}) == T.TimestampType()
    assert avro_to_spark_type(
        {"type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 2}
    ) == T.DecimalType(10, 2)


def test_multi_branch_union_tagged_struct():
    dt = avro_to_spark_type(["null", "string", "int"])
    assert isinstance(dt, T.StructType)
    assert [f.name for f in dt.fields] == ["member_string", "member_int"]


def test_samza_sql_type_aliases():
    assert avro_to_spark_type("int16") == T.ShortType()
    assert avro_to_spark_type("int64") == T.LongType()
    assert avro_to_spark_type("real") == T.FloatType()
    assert avro_to_spark_type("datetime") == T.TimestampType()


def test_ddl_to_struct():
    st = ddl_to_struct("a INT, b STRING, c ARRAY<DOUBLE>")
    assert st["c"].dataType == T.ArrayType(T.DoubleType())


def test_bad_schema_rejected():
    with pytest.raises(ValueError):
        avro_to_spark_type("not_a_type")
    with pytest.raises(ValueError):
        avro_to_struct("string")
