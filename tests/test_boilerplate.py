"""operators/boilerplate.py: planted-boilerplate stripping, order
preservation, within-doc repeats, and the all-boilerplate edge."""

from __future__ import annotations

import pytest

from file_appender_spark.operators.boilerplate import strip_boilerplate


def _rows(df):
    return {r["doc_id"]: (r["clean_text"], r["n_removed"]) for r in df.collect()}


def test_strips_planted_boilerplate_preserving_order(spark):
    common = "all rights reserved"
    rows = [
        (1, f"alpha one\n{common}\nbeta two"),
        (2, f"{common}\ngamma three"),
        (3, f"delta four\n{common}"),
        (4, f"epsilon five\nzeta six"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _rows(strip_boilerplate(df, max_df=2))
    assert got[1] == ("alpha one\nbeta two", 1)
    assert got[2] == ("gamma three", 1)
    assert got[3] == ("delta four", 1)
    assert got[4] == ("epsilon five\nzeta six", 0)


def test_within_doc_repeats_count_once_for_df_but_all_copies_removed(spark):
    rows = [
        (1, "spam\nspam\nreal content"),
        (2, "spam\nother stuff"),
        (3, "spam\nmore things"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # df('spam') = 3 distinct docs > 2 -> boilerplate; BOTH copies in
    # doc 1 go
    got = _rows(strip_boilerplate(df, max_df=2))
    assert got[1] == ("real content", 2)
    assert got[2] == ("other stuff", 1)
    # a line repeated within one doc but rare stays (df = 1)
    df2 = spark.createDataFrame([(9, "x\nx\ny")], "doc_id long, text string")
    assert _rows(strip_boilerplate(df2, max_df=2))[9] == ("x\nx\ny", 0)


def test_all_boilerplate_doc_emits_empty_not_dropped(spark):
    rows = [(1, "footer"), (2, "footer"), (3, "footer"), (4, "unique line")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _rows(strip_boilerplate(df, max_df=2))
    assert got[1] == ("", 1) and got[2] == ("", 1) and got[3] == ("", 1)
    assert got[4] == ("unique line", 0)


def test_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_df"):
        strip_boilerplate(df, max_df=0)
