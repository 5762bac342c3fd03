"""Dataset reconciliation (operators/datadiff.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from file_appender_spark.operators.datadiff import schema_diff, table_diff


def _rows(df):
    return sorted((r[0], r[1], tuple(r[2])) for r in df.collect())


def test_table_diff_added_removed_changed(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "id int, s string, v int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 21), (3, "c", 30), (5, "e", 50)],
        "id int, s string, v int",
    )
    got = _rows(table_diff(old, new, ["id"]))
    assert got == [
        (2, "changed", ("s", "v")),
        (3, "changed", ("v",)),  # null -> 30 is a change (null-safe)
        (4, "removed", ()),
        (5, "added", ()),
    ]


def test_table_diff_schema_superset_sides(spark):
    old = spark.createDataFrame([(1, "x")], "id int, a string")
    new = spark.createDataFrame([(1, "x", 9)], "id int, a string, b int")
    got = _rows(table_diff(old, new, ["id"]))
    # column b exists only on the new side: old compares as null
    assert got == [(1, "changed", ("b",))]


def test_table_diff_validates_keys(spark):
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError, match="key"):
        table_diff(df, df, [])
    with pytest.raises(ValueError, match="missing"):
        table_diff(df, df.withColumnRenamed("id", "other"), ["id"])


def test_table_diff_no_changes_is_empty(spark, sf_dir):
    from file_appender_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    assert table_diff(d, d, ["doc_id"]).count() == 0


def test_schema_diff(spark):
    old = spark.createDataFrame([(1, "x", 1.0)], "id int, a string, c double")
    new = spark.createDataFrame([(1, 2, "y")], "id int, c int, b string")
    assert schema_diff(old, new) == {
        "added": ["b"],
        "removed": ["a"],
        "type_changed": ["c"],
    }
