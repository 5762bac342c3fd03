"""Spark ``StructType`` -> Hive DDL column string.

Reproduces the reference's CDAP→Hive mapper semantics
(SchemaConverter.java:53-149): the full type table of SURVEY.md §1.3,
backtick-escaped names with literal backticks doubled
(SchemaConverter.java:139-143), ``name type`` at the top level and
``name:type`` inside structs (SchemaConverter.java:145-148), and
rejection of non-record roots.
"""

from __future__ import annotations

from pyspark.sql import types as T


class HiveConversionError(ValueError):
    pass


_SIMPLE: dict[type, str] = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.LongType: "bigint",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.BinaryType: "binary",
    T.StringType: "string",
    # extensions beyond the reference mapper (SURVEY.md §1.3 note):
    T.DateType: "date",
    T.TimestampType: "timestamp",
    T.TimestampNTZType: "timestamp_ntz",
    T.ShortType: "smallint",
    T.ByteType: "tinyint",
}


def _escape(name: str) -> str:
    """Backtick-escape, doubling literal backticks
    (SchemaConverter.java:139-143)."""
    return "`" + name.replace("`", "``") + "`"


def _type_to_hive(dtype: T.DataType) -> str:
    for cls, hive in _SIMPLE.items():
        if isinstance(dtype, cls):
            return hive
    if isinstance(dtype, T.NullType):
        # NULL emits nothing in the reference (SchemaConverter.java:73-74);
        # as a standalone type it cannot appear in DDL
        raise HiveConversionError("null type has no Hive DDL representation")
    if isinstance(dtype, T.DecimalType):
        return f"decimal({dtype.precision},{dtype.scale})"
    if isinstance(dtype, T.ArrayType):
        return f"array<{_type_to_hive(dtype.elementType)}>"
    if isinstance(dtype, T.MapType):
        return f"map<{_type_to_hive(dtype.keyType)},{_type_to_hive(dtype.valueType)}>"
    if isinstance(dtype, T.StructType):
        inner = ",".join(
            f"{_escape(f.name)}:{_type_to_hive(f.dataType)}" for f in dtype.fields
        )
        return f"struct<{inner}>"
    raise HiveConversionError(
        f"type {dtype.simpleString()} is not representable in Hive DDL"
    )


def to_hive_schema(schema: T.StructType) -> str:
    """Top-level DDL: ``\\`name\\` type, ...`` (SchemaConverter.java:145-148)."""
    if not isinstance(schema, T.StructType):
        raise HiveConversionError("top-level schema must be a record/struct")
    return ", ".join(
        f"{_escape(f.name)} {_type_to_hive(f.dataType)}" for f in schema.fields
    )
