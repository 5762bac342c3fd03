"""SCD2 merge emulation tests (MERGE INTO without Delta: anti-join +
union + close-out)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from file_appender_spark.operators.scd2 import latest_snapshot, scd2_merge

DIM_SCHEMA = (
    "k long, city string, tier string, eff timestamp, end_ts timestamp, "
    "is_current boolean"
)


def ts(s):
    return dt.datetime.fromisoformat(s)


def make_dim(spark):
    return spark.createDataFrame(
        [
            (1, "paris", "gold", ts("2020-01-01"), None, True),
            (2, "rome", "silver", ts("2020-01-01"), None, True),
            # key 3 has history: old closed row + current
            (3, "oslo", "bronze", ts("2019-01-01"), ts("2020-01-01"), False),
            (3, "oslo", "silver", ts("2020-01-01"), None, True),
        ],
        DIM_SCHEMA,
    )


def test_scd2_merge_changes_and_inserts(spark):
    dim = make_dim(spark)
    updates = spark.createDataFrame(
        [
            (1, "paris", "gold"),      # unchanged -> untouched
            (2, "rome", "gold"),       # changed   -> close + new
            (4, "lima", "bronze"),     # new key   -> insert
        ],
        "k long, city string, tier string",
    )
    out = scd2_merge(
        dim, updates, key="k", compare_cols=["city", "tier"],
        effective_col="eff", run_ts=ts("2021-06-01"),
    )
    rows = {(r["k"], r["tier"], r["is_current"], r["end_ts"]) for r in out.collect()}
    # unchanged key 1: single current row, no close-out
    assert (1, "gold", True, None) in rows
    # changed key 2: old row closed at run_ts + new current row
    assert (2, "silver", False, ts("2021-06-01")) in rows
    assert (2, "gold", True, None) in rows
    # new key 4 inserted as current
    assert (4, "bronze", True, None) in rows
    # key 3 untouched incl. history
    assert (3, "bronze", False, ts("2020-01-01")) in rows
    assert (3, "silver", True, None) in rows
    # 3 untouched (keys 1, 3-history, 3-current) + 1 closed (key 2)
    # + 2 new current rows (keys 2, 4)
    assert out.count() == 6

def test_scd2_merge_counts(spark):
    dim = make_dim(spark)
    updates = spark.createDataFrame(
        [(2, "rome", "gold")], "k long, city string, tier string"
    )
    out = scd2_merge(
        dim, updates, key="k", compare_cols=["city", "tier"],
        effective_col="eff", run_ts=ts("2021-06-01"),
    )
    # 4 original rows (one flipped to closed) + 1 new current
    assert out.count() == 5
    assert out.filter(F.col("is_current") & (F.col("k") == 2)).count() == 1


def test_scd2_idempotent_when_no_changes(spark):
    dim = make_dim(spark)
    updates = spark.createDataFrame(
        [(1, "paris", "gold")], "k long, city string, tier string"
    )
    out = scd2_merge(
        dim, updates, key="k", compare_cols=["city", "tier"],
        effective_col="eff", run_ts=ts("2021-06-01"),
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, dim.collect()))


def test_scd2_null_vs_empty_is_a_change(spark):
    # regression: NULL -> '' must be detected as a change (the old
    # concat-based comparison conflated them)
    dim = spark.createDataFrame(
        [(1, None, "gold", ts("2020-01-01"), None, True)], DIM_SCHEMA
    )
    updates = spark.createDataFrame(
        [(1, "", "gold")], "k long, city string, tier string"
    )
    out = scd2_merge(
        dim, updates, key="k", compare_cols=["city", "tier"],
        effective_col="eff", run_ts=ts("2021-06-01"),
    )
    assert out.count() == 2  # closed old row + new current row
    cur = out.filter(F.col("is_current")).collect()
    assert len(cur) == 1 and cur[0]["city"] == ""


def test_scd2_empty_compare_cols_inserts_only_new_keys(spark):
    dim = make_dim(spark)
    updates = spark.createDataFrame(
        [(1,), (99,)], "k long"
    )
    out = scd2_merge(
        dim, updates, key="k", compare_cols=[],
        effective_col="eff", run_ts=ts("2021-06-01"),
    )
    # existing key 1 untouched; new key 99 inserted
    assert out.count() == dim.count() + 1
    assert out.filter(F.col("k") == 99).count() == 1


def test_latest_snapshot(spark):
    dim = make_dim(spark)
    snap = latest_snapshot(dim, key="k", effective_col="eff")
    got = {(r["k"], r["tier"]) for r in snap.collect()}
    assert got == {(1, "gold"), (2, "silver"), (3, "silver")}
