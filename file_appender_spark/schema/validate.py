"""Collecting validation, mirroring the reference's FailureCollector
semantics (FileAppenderSink.java:62-68: errors accumulate and throw
as a batch via ``getOrThrowException``, never fail-fast).

Rules reproduced:
- thresholds must be >= 0 (FileAppenderSinkConfig.java:88-97)
- every declared output field must exist in the input schema
  (FileAppenderSinkConfig.java:108-114)
- its non-nullable-stripped base type must equal the input field's
  (FileAppenderSinkConfig.java:116-125, 173-175) — nullability
  differences are deliberately ignored
- malformed schema JSON is a collected failure attributed to the
  config property, with the parse cause attached
  (FileAppenderSinkConfig.java:99-107)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


@dataclass
class ValidationFailure:
    message: str
    # attribution, mirroring the reference's cause attributes
    # (FileAppenderSinkConfigTest.java:97-133)
    config_property: str | None = None
    schema_field: str | None = None
    cause: BaseException | None = None


class SchemaValidationError(ValueError):
    def __init__(self, failures: list[ValidationFailure]):
        self.failures = failures
        super().__init__(
            "; ".join(f.message for f in failures) or "validation failed"
        )


@dataclass
class FailureCollector:
    """Accumulates failures; ``get_or_throw`` raises once with all of
    them, like io.cdap FailureCollector.getOrThrowException."""

    failures: list[ValidationFailure] = field(default_factory=list)

    def add(
        self,
        message: str,
        *,
        config_property: str | None = None,
        schema_field: str | None = None,
        cause: BaseException | None = None,
    ) -> None:
        self.failures.append(
            ValidationFailure(message, config_property, schema_field, cause)
        )

    def get_or_throw(self) -> None:
        if self.failures:
            raise SchemaValidationError(self.failures)


def _base_type(dtype: T.DataType) -> T.DataType:
    """Strip nothing in Spark-land (nullability lives on the field, not
    the type) — kept for clarity of intent vs the reference's
    ``getNonNullableSchema`` (FileAppenderSinkConfig.java:173-175)."""
    return dtype


def validate_thresholds(
    size_threshold_mb: int | None,
    age_threshold_min: int | None,
    collector: FailureCollector,
) -> None:
    """size/age must be >= 0; 0 means unlimited
    (FileAppenderSinkConfig.java:88-97; docs/FileAppender-batchsink.md:24-28)."""
    if size_threshold_mb is not None and size_threshold_mb < 0:
        collector.add(
            f"Size threshold must be at least 0, got {size_threshold_mb}.",
            config_property="sizeThreshold",
        )
    if age_threshold_min is not None and age_threshold_min < 0:
        collector.add(
            f"Age threshold must be at least 0, got {age_threshold_min}.",
            config_property="ageThreshold",
        )


def validate_output_schema(
    input_schema: T.StructType,
    output_schema: T.StructType,
    collector: FailureCollector,
) -> None:
    """Every output field must exist in input with the same base type;
    nullability differences ignored (FileAppenderSinkConfig.java:99-129)."""
    input_fields = {f.name: f for f in input_schema.fields}
    for out_field in output_schema.fields:
        in_field = input_fields.get(out_field.name)
        if in_field is None:
            collector.add(
                f"Output field '{out_field.name}' does not exist in the "
                f"input schema.",
                config_property="schema",
                schema_field=out_field.name,
            )
            continue
        if _base_type(in_field.dataType) != _base_type(out_field.dataType):
            collector.add(
                f"Output field '{out_field.name}' has type "
                f"{out_field.dataType.simpleString()} but the input field "
                f"has type {in_field.dataType.simpleString()}.",
                config_property="schema",
                schema_field=out_field.name,
            )
