"""Streaming SQL surface: ``INSERT INTO sink SELECT ...`` (SURVEY.md §2.3, §3.1)."""

from samza_spark.sql.parser import parse_statements, SqlStatement
from samza_spark.sql.validator import validate_compat, SqlValidationError
from samza_spark.sql.runner import SqlApplication

__all__ = [
    "parse_statements",
    "SqlStatement",
    "validate_compat",
    "SqlValidationError",
    "SqlApplication",
]
