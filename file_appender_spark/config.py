"""Sink configuration, mirroring FileAppenderSinkConfig.java.

Defaults are applied in the constructor (100 MB / 60 min / ``,``),
fixing the reference's null-threshold NPE risk where defaults lived
only in the UI widget layer (FileAppenderSinkConfig.java:89,93 vs
widgets/FileAppender-batchsink.json:36-46 — SURVEY.md §2.1).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

from file_appender_spark.schema.loader import SchemaParseError, parse_json_schema
from file_appender_spark.schema.validate import (
    FailureCollector,
    validate_output_schema,
    validate_thresholds,
)

DEFAULT_SIZE_THRESHOLD_MB = 100  # docs/FileAppender-batchsink.md:24-25
DEFAULT_AGE_THRESHOLD_MIN = 60  # docs/FileAppender-batchsink.md:27-28
DEFAULT_FIELD_SEPARATOR = ","  # docs/FileAppender-batchsink.md:18
DEFAULT_FILE_PREFIX = "file"  # widgets/FileAppender-batchsink.json:28-30


@dataclass
class AppendSinkConfig:
    """Config for the append-text sink (FileAppenderSinkConfig.java:22-86).

    ``size_threshold_mb``/``age_threshold_min`` of 0 mean "unlimited";
    the engine treats 0 as no-rotation in BOTH the scan filter and the
    per-record rotation check (the sane fix for the reference's
    pathological sizeThreshold=0 busy-loop, SURVEY.md §2.1).
    """

    output_dir: str
    file_prefix: str = DEFAULT_FILE_PREFIX
    field_separator: str = DEFAULT_FIELD_SEPARATOR
    size_threshold_mb: int = DEFAULT_SIZE_THRESHOLD_MB
    age_threshold_min: int = DEFAULT_AGE_THRESHOLD_MIN
    schema_json: str | None = None
    # faithful-vs-sane switch for the first-field projection quirk
    # (FileAppenderSink.java:133-141, SURVEY.md §1.4.2). Default faithful.
    faithful_first_field: bool = True

    @property
    def size_threshold_bytes(self) -> int:
        # MB -> bytes conversion as in FileAppenderSink.java:101
        return self.size_threshold_mb * 1024 * 1024

    @property
    def age_threshold_ms(self) -> int:
        # minutes -> ms as in AppendOutputFormat.java:75 (the constant
        # named *_SEC actually carries minutes — SURVEY.md §2.1)
        return self.age_threshold_min * 60 * 1000

    def parsed_schema(self) -> T.StructType | None:
        """Parse the configured output schema, if any
        (FileAppenderSinkConfig.java:164-171)."""
        if self.schema_json is None:
            return None
        return parse_json_schema(self.schema_json)

    def validate(
        self,
        input_schema: T.StructType | None = None,
        collector: FailureCollector | None = None,
    ) -> FailureCollector:
        """Collecting validation (FileAppenderSink.java:62-68): thresholds,
        schema JSON parse, and output⊆input field/type check."""
        collector = collector or FailureCollector()
        validate_thresholds(self.size_threshold_mb, self.age_threshold_min, collector)
        output_schema: T.StructType | None = None
        if self.schema_json is not None:
            try:
                output_schema = parse_json_schema(self.schema_json)
            except SchemaParseError as exc:
                collector.add(
                    f"Invalid schema: {exc}",
                    config_property="schema",
                    cause=exc,
                )
        if output_schema is not None and input_schema is not None:
            validate_output_schema(input_schema, output_schema, collector)
        return collector
