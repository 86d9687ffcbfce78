"""File-format codecs that work without optional connector jars."""

from samza_spark.formats.avro_py import read_avro, write_avro, spark_to_avro_schema

__all__ = ["read_avro", "write_avro", "spark_to_avro_schema"]
