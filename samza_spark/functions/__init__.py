"""Scalar functions & UDF registry (SURVEY.md §2.4-2.5)."""

from samza_spark.functions.registry import UdfRegistry
from samza_spark.functions.builtins import register_builtins, BUILTIN_UDFS

__all__ = ["UdfRegistry", "register_builtins", "BUILTIN_UDFS"]
