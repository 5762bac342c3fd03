"""Config/schema validation unit tests, ported from the reference's
FileAppenderSinkConfigTest.java (142 LoC, 7 tests — SURVEY.md §5):
valid config, negative size threshold, negative age threshold, valid
output schema, malformed schema JSON with cause, output field missing
from input, output field type mismatch. Fixture schemas mirror the
reference's (ID: nullable long; input variants UID / ID-as-string,
FileAppenderSinkConfigTest.java:16-17, 78-79, 88-89).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from file_appender_spark.config import AppendSinkConfig
from file_appender_spark.schema import (
    FailureCollector,
    SchemaValidationError,
    parse_json_schema,
    to_hive_schema,
    validate_output_schema,
)
from file_appender_spark.schema.loader import SchemaParseError

ID_LONG = json.dumps(
    {
        "type": "record",
        "name": "out",
        "fields": [{"name": "ID", "type": ["long", "null"]}],
    }
)


def cfg(**kw) -> AppendSinkConfig:
    return AppendSinkConfig(output_dir="/tmp/out", **kw)


def input_schema(name="ID", dtype=T.LongType()) -> T.StructType:
    return T.StructType([T.StructField(name, dtype, True)])


class TestValidate:
    def test_valid_config(self):
        collector = cfg(schema_json=ID_LONG).validate(input_schema())
        assert collector.failures == []

    def test_negative_size_threshold(self):
        collector = cfg(size_threshold_mb=-1).validate()
        assert len(collector.failures) == 1
        assert collector.failures[0].config_property == "sizeThreshold"
        with pytest.raises(SchemaValidationError):
            collector.get_or_throw()

    def test_negative_age_threshold(self):
        collector = cfg(age_threshold_min=-1).validate()
        assert len(collector.failures) == 1
        assert collector.failures[0].config_property == "ageThreshold"

    def test_valid_output_schema(self):
        collector = cfg(schema_json=ID_LONG).validate(input_schema())
        assert collector.failures == []

    def test_malformed_schema_json_has_cause(self):
        collector = cfg(schema_json="{not json").validate(input_schema())
        assert len(collector.failures) == 1
        f = collector.failures[0]
        assert f.config_property == "schema"
        assert isinstance(f.cause, SchemaParseError)

    def test_output_field_missing_from_input(self):
        # input has UID, output declares ID (FileAppenderSinkConfigTest.java:76-84)
        collector = cfg(schema_json=ID_LONG).validate(input_schema(name="UID"))
        assert len(collector.failures) == 1
        assert collector.failures[0].schema_field == "ID"

    def test_output_field_type_mismatch(self):
        # input ID is string, output declares long (FileAppenderSinkConfigTest.java:86-95)
        collector = cfg(schema_json=ID_LONG).validate(
            input_schema(dtype=T.StringType())
        )
        assert len(collector.failures) == 1
        assert collector.failures[0].schema_field == "ID"

    def test_failures_accumulate_not_fail_fast(self):
        # collecting semantics (FileAppenderSink.java:62-68)
        collector = cfg(
            size_threshold_mb=-5, age_threshold_min=-5, schema_json="{bad"
        ).validate(input_schema())
        assert len(collector.failures) == 3

    def test_nullability_difference_ignored(self):
        # only base types matter (FileAppenderSinkConfig.java:116-125)
        out = T.StructType([T.StructField("ID", T.LongType(), False)])
        collector = FailureCollector()
        validate_output_schema(input_schema(), out, collector)
        assert collector.failures == []


class TestLoader:
    def test_scalars_and_nullable_union(self):
        st = parse_json_schema(ID_LONG)
        assert st == T.StructType([T.StructField("ID", T.LongType(), True)])

    def test_nested_record_array_map(self):
        s = json.dumps(
            {
                "type": "record",
                "name": "r",
                "fields": [
                    {"name": "tags", "type": {"type": "array", "items": "string"}},
                    {
                        "name": "props",
                        "type": {"type": "map", "keys": "string", "values": "double"},
                    },
                    {
                        "name": "nested",
                        "type": {
                            "type": "record",
                            "name": "n",
                            "fields": [{"name": "a", "type": "int"}],
                        },
                    },
                ],
            }
        )
        st = parse_json_schema(s)
        assert isinstance(st["tags"].dataType, T.ArrayType)
        assert isinstance(st["props"].dataType, T.MapType)
        assert isinstance(st["nested"].dataType, T.StructType)

    def test_general_union_rejected(self):
        s = json.dumps(
            {
                "type": "record",
                "name": "r",
                "fields": [{"name": "u", "type": ["long", "string"]}],
            }
        )
        with pytest.raises(SchemaParseError):
            parse_json_schema(s)

    def test_non_record_root_rejected(self):
        with pytest.raises(SchemaParseError):
            parse_json_schema(json.dumps("string"))


class TestHive:
    def test_full_type_table(self):
        # SURVEY.md §1.3 type table, SchemaConverter.java:71-134
        st = T.StructType(
            [
                T.StructField("b", T.BooleanType()),
                T.StructField("i", T.IntegerType()),
                T.StructField("l", T.LongType()),
                T.StructField("f", T.FloatType()),
                T.StructField("d", T.DoubleType()),
                T.StructField("y", T.BinaryType()),
                T.StructField("s", T.StringType()),
                T.StructField("a", T.ArrayType(T.IntegerType())),
                T.StructField("m", T.MapType(T.StringType(), T.LongType())),
                T.StructField(
                    "r", T.StructType([T.StructField("x", T.StringType())])
                ),
            ]
        )
        ddl = to_hive_schema(st)
        assert ddl == (
            "`b` boolean, `i` int, `l` bigint, `f` float, `d` double, "
            "`y` binary, `s` string, `a` array<int>, "
            "`m` map<string,bigint>, `r` struct<`x`:string>"
        )

    def test_backtick_doubling(self):
        # SchemaConverter.java:139-143
        st = T.StructType([T.StructField("we`ird", T.StringType())])
        assert to_hive_schema(st) == "`we``ird` string"
