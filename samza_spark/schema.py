"""Schema system: Avro-style schemas -> Spark ``StructType``.

Replaces Samza's Avro-centric schema stack — ``AvroRelConverter``
(/root/reference samza-sql/.../avro/AvroRelConverter.java:63-158),
``AvroTypeFactoryImpl`` and ``RelSchemaConverter``
(samza-sql/.../planner/RelSchemaConverter.java:1-109) — with a single
converter from an Avro schema (JSON dict or string) to ``StructType``.
Serdes (samza-api/.../serializers/) disappear entirely: Spark encoders /
Arrow replace per-message serialization.

Type mapping follows SamzaSqlFieldType
(samza-api/.../sql/schema/SamzaSqlFieldType.java:25-43); see SURVEY.md §1.2.
Union handling follows AvroRelConverter: a 2-branch union with ``null`` is a
nullable field; non-null multi-branch unions become a tagged struct with one
nullable field per branch (documented convention, SURVEY.md §7.3).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

# SamzaSqlFieldType -> Spark type (SURVEY.md §1.2)
PRIMITIVES: dict[str, T.DataType] = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
    # Samza SQL names (SamzaSqlFieldType.java) accepted as aliases:
    "byte": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "real": T.FloatType(),
    "datetime": T.TimestampType(),
}

LOGICAL_TYPES: dict[str, T.DataType] = {
    "timestamp-millis": T.TimestampType(),
    "timestamp-micros": T.TimestampType(),
    "date": T.DateType(),
    "decimal": T.DecimalType(38, 18),
    "uuid": T.StringType(),
}


def avro_to_spark_type(schema: Any) -> T.DataType:
    """Convert one Avro schema node to a Spark DataType."""
    if isinstance(schema, str):
        stripped = schema.strip()
        if stripped.startswith("{") or stripped.startswith("["):
            schema = json.loads(stripped)
        else:
            if stripped not in PRIMITIVES:
                raise ValueError(f"unknown avro primitive: {stripped!r}")
            return PRIMITIVES[stripped]

    if isinstance(schema, list):  # union
        return _union_to_spark_type(schema)

    if not isinstance(schema, dict):
        raise ValueError(f"bad avro schema node: {schema!r}")

    logical = schema.get("logicalType")
    if logical:
        if logical == "decimal":
            return T.DecimalType(schema.get("precision", 38), schema.get("scale", 18))
        if logical in LOGICAL_TYPES:
            return LOGICAL_TYPES[logical]

    t = schema["type"]
    if isinstance(t, (list, dict)):
        return avro_to_spark_type(t)
    if t in PRIMITIVES:
        return PRIMITIVES[t]
    if t == "array":
        # element nullability mirrors the items schema (nullable union or not)
        return T.ArrayType(avro_to_spark_type(schema["items"]), _nullable(schema["items"]))
    if t == "map":  # Avro maps are string-keyed (matches Samza's MAP type)
        return T.MapType(
            T.StringType(), avro_to_spark_type(schema["values"]), _nullable(schema["values"])
        )
    if t == "record":
        return T.StructType(
            [
                T.StructField(
                    f["name"], avro_to_spark_type(f["type"]), _nullable(f["type"])
                )
                for f in schema.get("fields", [])
            ]
        )
    if t == "enum":  # AvroRelConverter maps enum symbols to strings
        return T.StringType()
    if t == "fixed":  # Avro fixed -> bytes (AvroRelConverter.java:158)
        return T.BinaryType()
    raise ValueError(f"unsupported avro type: {t!r}")


def _nullable(node: Any) -> bool:
    return isinstance(node, list) and any(
        b == "null" or (isinstance(b, dict) and b.get("type") == "null") for b in node
    )


def _union_to_spark_type(branches: list) -> T.DataType:
    non_null = [
        b
        for b in branches
        if not (b == "null" or (isinstance(b, dict) and b.get("type") == "null"))
    ]
    if len(non_null) == 1:
        return avro_to_spark_type(non_null[0])
    # Multi-branch non-null union -> tagged struct (SURVEY.md §7.3).
    fields = []
    for i, b in enumerate(non_null):
        name = b if isinstance(b, str) else b.get("name", b.get("type", f"member{i}"))
        fields.append(T.StructField(f"member_{name}", avro_to_spark_type(b), True))
    return T.StructType(fields)


def avro_to_struct(schema: Any) -> T.StructType:
    """Convert a top-level Avro record schema to a StructType."""
    dt = avro_to_spark_type(schema)
    if not isinstance(dt, T.StructType):
        raise ValueError("top-level schema must be an Avro record")
    return dt


def ddl_to_struct(ddl: str) -> T.StructType:
    """Parse a Spark SQL DDL schema string (``a INT, b STRING``)."""
    parsed = T._parse_datatype_string(ddl)
    if not isinstance(parsed, T.StructType):
        raise ValueError("DDL must describe a struct")
    return parsed
