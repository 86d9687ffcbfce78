"""UDF registry — the ScalarUdf / @SamzaSqlUdf analog.

Reference: /root/reference samza-api/.../sql/udfs/ScalarUdf.java:34,
SamzaSqlUdf.java:33, SamzaSqlUdfMethod.java:34-45 (polymorphic + vararg
methods), resolved via ConfigBasedUdfResolver / ReflectionBasedUdfResolver
and bound to Calcite in SamzaSqlScalarFunctionImpl.java.

Spark mapping: ``spark.udf.register`` with either a plain Python UDF or an
Arrow-vectorised pandas UDF. Samza has no UDAF/UDTF (SURVEY.md §2.5) — we
accept pandas-aggregate registration as an extension flag.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@dataclass
class UdfSpec:
    name: str
    fn: Callable
    return_type: object  # DataType or DDL string
    vectorized: bool = True  # pandas UDF (Arrow) vs row-at-a-time


@dataclass
class UdfRegistry:
    """Registers scalar functions with a SparkSession so both the DSL and
    the SQL surface (spark.sql) can call them by name."""

    udfs: dict = field(default_factory=dict)

    def register(self, name: str, fn: Callable, return_type, vectorized: bool = True) -> "UdfRegistry":
        self.udfs[name] = UdfSpec(name, fn, return_type, vectorized)
        return self

    def attach(self, spark: SparkSession) -> None:
        for spec in self.udfs.values():
            if spec.vectorized:
                spark.udf.register(spec.name, F.pandas_udf(spec.fn, spec.return_type))
            else:
                spark.udf.register(spec.name, spec.fn, spec.return_type)

    def names(self) -> list:
        return sorted(self.udfs)
