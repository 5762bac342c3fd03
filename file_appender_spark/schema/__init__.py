"""Schema kernel: loader, validation, Hive DDL mapping.

Reproduces the reference's schema system (SURVEY.md §1.2-1.3):
Avro-style JSON schema parsing (FileAppenderSinkConfig.java:164-171),
collecting validation (FileAppenderSink.java:62-68), and the CDAP→Hive
type mapper (SchemaConverter.java:53-149) — re-targeted at Spark's
``StructType``.
"""

from file_appender_spark.schema.loader import parse_json_schema
from file_appender_spark.schema.validate import (
    FailureCollector,
    SchemaValidationError,
    ValidationFailure,
    validate_output_schema,
    validate_thresholds,
)
from file_appender_spark.schema.hive import to_hive_schema

__all__ = [
    "parse_json_schema",
    "FailureCollector",
    "SchemaValidationError",
    "ValidationFailure",
    "validate_output_schema",
    "validate_thresholds",
    "to_hive_schema",
]
