"""Avro-style JSON schema string -> Spark ``StructType``.

Mirrors the reference's ``Schema.parseJson`` usage
(FileAppenderSinkConfig.java:164-171): the sink config carries an
Avro-ish JSON record schema; invalid JSON surfaces as a validation
failure rather than a crash (FileAppenderSinkConfigTest.java:64-74).

Type surface = the reference's full lattice (SchemaConverter.java:71-134):
null, enum, boolean, int, long, float, double, bytes, string, array,
map, record, nullable-union. General (non-nullable) unions are
unsupported, matching SchemaConverter.java:130-132. As a declared
extension beyond the reference (SURVEY.md §1.3 note) the loader also
accepts ``date``/``timestamp[-micros]`` logical types, because the
driver tables contain timestamp columns.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

_SCALARS: dict[str, T.DataType] = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
    # extensions beyond the reference type surface (SURVEY.md §1.3)
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
}


class SchemaParseError(ValueError):
    """Raised for malformed schema JSON; carries the parse cause so a
    FailureCollector can attribute it (FileAppenderSinkConfigTest.java:65-74)."""


def _parse_type(node: Any) -> tuple[T.DataType, bool]:
    """Return (dtype, nullable). Nullable is expressed as a 2-branch
    union with "null" (SchemaConverter.java:125-129)."""
    if isinstance(node, str):
        name = node.lower()
        if name in _SCALARS:
            return _SCALARS[name], name == "null"
        if name.startswith("timestamp"):  # timestamp-micros / -millis
            return T.TimestampType(), False
        raise SchemaParseError(f"unknown type name: {node!r}")
    if isinstance(node, list):  # union
        non_null = [b for b in node if b != "null"]
        if len(non_null) == 1 and len(node) == 2:
            dtype, _ = _parse_type(non_null[0])
            return dtype, True
        # general unions unsupported, like SchemaConverter.java:130-132
        raise SchemaParseError(f"general unions are not supported: {node!r}")
    if isinstance(node, dict):
        t = node.get("type")
        if t == "record":
            fields = []
            for f in node.get("fields", []):
                fdt, fnull = _parse_type(f["type"])
                fields.append(T.StructField(f["name"], fdt, fnull))
            return T.StructType(fields), False
        if t == "array":
            edt, enull = _parse_type(node["items"])
            return T.ArrayType(edt, containsNull=enull), False
        if t == "map":
            kdt, _ = _parse_type(node.get("keys", "string"))
            vdt, vnull = _parse_type(node["values"])
            if not isinstance(kdt, T.StringType):
                # Spark allows non-string map keys; keep them
                pass
            return T.MapType(kdt, vdt, valueContainsNull=vnull), False
        if t == "enum":
            # enums render as string (SchemaConverter.java:75-77)
            return T.StringType(), False
        if isinstance(t, (str, list, dict)):
            return _parse_type(t)
        raise SchemaParseError(f"unsupported complex type: {node!r}")
    raise SchemaParseError(f"unsupported schema node: {node!r}")


def parse_json_schema(schema_json: str) -> T.StructType:
    """Parse an Avro-style JSON record schema string to ``StructType``.

    Raises :class:`SchemaParseError` on malformed JSON or a non-record
    root (SchemaConverter.java:62-66 rejects non-record roots too).
    """
    try:
        node = json.loads(schema_json)
    except (json.JSONDecodeError, TypeError) as exc:
        raise SchemaParseError(f"invalid schema JSON: {exc}") from exc
    dtype, _ = _parse_type(node)
    if not isinstance(dtype, T.StructType):
        raise SchemaParseError(
            f"schema root must be a record, got {dtype.simpleString()}"
        )
    return dtype
