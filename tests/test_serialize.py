"""Serializer unit tests — SURVEY.md §1.4 rules, incl. the
first-field quirk and null rendering."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from file_appender_spark.serialize import serialized

SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), True),
        T.StructField("item", T.StringType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)


def make_df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def lines(df):
    return [r[0] for r in df.collect()]


def test_basic_join_and_null_empty(spark):
    df = make_df(spark, [("samuel", "wallet", 3), ("dwayne", None, None)])
    out = lines(serialized(df))
    assert sorted(out) == sorted(["samuel,wallet,3", "dwayne,,"])


def test_custom_separator(spark):
    df = make_df(spark, [("a", "b", 1)])
    assert lines(serialized(df, separator="|")) == ["a|b|1"]


def test_projection_skips_missing_fields_after_first(spark):
    out_schema = T.StructType(
        [
            T.StructField("name", T.StringType(), True),
            T.StructField("n", T.LongType(), True),
        ]
    )
    df = make_df(spark, [("a", "b", 1)])
    assert lines(serialized(df, output_schema=out_schema)) == ["a,1"]


def test_first_field_quirk_faithful(spark):
    # output schema omits the FIRST input field -> still written
    # (FileAppenderSink.java:133-141 checks only fields after the first)
    out_schema = T.StructType([T.StructField("item", T.StringType(), True)])
    df = make_df(spark, [("a", "b", 1)])
    assert lines(serialized(df, output_schema=out_schema)) == ["a,b"]


def test_first_field_quirk_sane(spark):
    out_schema = T.StructType([T.StructField("item", T.StringType(), True)])
    df = make_df(spark, [("a", "b", 1)])
    assert lines(
        serialized(df, output_schema=out_schema, faithful_first_field=False)
    ) == ["b"]


def test_null_first_field_renders_empty(spark):
    df = make_df(spark, [(None, "b", 1)])
    assert lines(serialized(df)) == [",b,1"]


def test_no_quoting_separator_inside_value(spark):
    # naive join: separators inside values are NOT escaped (§1.4.6)
    df = make_df(spark, [("a,x", "b", 1)])
    assert lines(serialized(df)) == ["a,x,b,1"]


def test_numeric_rendering(spark):
    schema = T.StructType(
        [
            T.StructField("d", T.DoubleType(), True),
            T.StructField("b", T.BooleanType(), True),
        ]
    )
    df = spark.createDataFrame([(1.5, True)], schema)
    assert lines(serialized(df)) == ["1.5,true"]
