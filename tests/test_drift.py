"""Quantile-grid KS drift monitor (operators/drift.py): agreement
with the exact KS within the grid's error bound, sensitivity to a
planted shift, and the streaming foreachBatch drive."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from file_appender_spark.operators.drift import (
    binned_ks,
    ks_monitor_batch,
    quantile_grid,
    reference_cum,
)
from file_appender_spark.sources.catalog import load_table


def _sides(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01 00:00:00").cast("timestamp")
    return (
        o.filter(F.col("o_orderdate") < cut).select("o_totalprice"),
        o.filter(F.col("o_orderdate") >= cut).select("o_totalprice"),
    )


def test_binned_ks_tracks_exact_ks(spark, sf_dir):
    """The grid KS must sit within ~1 bin mass of the exact KS
    (q117's value on the same split)."""
    from file_appender_spark.queries import QUERIES

    a, b = _sides(spark, sf_dir)
    grid = quantile_grid(a, "o_totalprice", n_bins=32)
    approx = binned_ks(a, b, "o_totalprice", grid)
    exact = QUERIES["q117_ks_drift"].spark_fn(spark, sf_dir).collect()[0]["ks_stat"]
    assert abs(approx - exact) <= 1.0 / 32 + 1e-9
    # and never overestimates: the sup over a subset of evaluation
    # points is <= the true sup
    assert approx <= exact + 1e-9


def test_binned_ks_zero_on_identical_and_big_on_shift(spark):
    base = spark.range(2000).select((F.col("id") % 100).cast("double").alias("x"))
    shifted = base.select((F.col("x") + 50.0).alias("x"))
    grid = quantile_grid(base, "x", n_bins=16)
    assert binned_ks(base, base, "x", grid) == 0.0
    assert binned_ks(base, shifted, "x", grid) > 0.4


def test_ks_monitor_batch_report(spark):
    base = spark.range(1000).select((F.col("id") % 97).cast("double").alias("x"))
    grid = quantile_grid(base, "x", n_bins=8)
    ref = reference_cum(base, "x", grid)
    same = ks_monitor_batch(base, "x", grid, ref)
    assert same["n_rows"] == 1000 and same["ks"] == 0.0
    empty = ks_monitor_batch(base.filter("x < 0"), "x", grid, ref)
    assert empty["n_rows"] == 0 and empty["ks"] is None


def test_ks_monitor_streaming_foreachbatch(spark, tmp_path):
    """Drive the monitor through a REAL micro-batch stream: reference
    frozen up front, each file becomes a batch, reports accumulate."""
    import pandas as pd

    src = tmp_path / "stream_src"
    src.mkdir()
    base = spark.range(500).select((F.col("id") % 50).cast("double").alias("x"))
    grid = quantile_grid(base, "x", n_bins=8)
    ref = reference_cum(base, "x", grid)

    pd.DataFrame({"x": [float(i % 50) for i in range(200)]}).to_parquet(
        src / "b0.parquet"
    )
    pd.DataFrame({"x": [float(i % 50) + 40.0 for i in range(200)]}).to_parquet(
        src / "b1.parquet"
    )

    reports = []

    def monitor(batch_df, batch_id):
        reports.append(ks_monitor_batch(batch_df, "x", grid, ref))

    stream = (
        spark.readStream.schema("x double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = stream.writeStream.foreachBatch(monitor).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(reports) == 2
    by_drift = sorted(r["ks"] for r in reports)
    assert by_drift[0] <= 0.01  # the in-distribution batch
    assert by_drift[1] > 0.4  # the shifted batch screams


def test_bin_counts_and_ks_ignore_nulls(spark):
    """Nulls must be excluded before binning: (col >= b) is NULL for
    null values, which used to produce a NULL bin whose rows inflated
    the total without entering the cumulative sums — fractions never
    reached 1.0 and identical distributions read as drifted."""
    from file_appender_spark.operators.drift import bin_counts

    clean = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    dirty = spark.createDataFrame(
        [(float(i),) for i in range(100)] + [(None,)] * 50, "x double"
    )
    grid = quantile_grid(clean, "x", n_bins=8)
    # no NULL bin may exist
    bins = {r["bin"] for r in bin_counts(dirty, "x", grid).collect()}
    assert None not in bins
    # same values + nulls == same values: zero drift
    assert binned_ks(clean, dirty, "x", grid) == 0.0


def test_tvd_monitor_matches_q247_day_pair(spark, sf_dir):
    """The streaming TVD monitor and q247's batch day-pair TVD share
    one integer-numerator definition: monitoring day 2 against a
    frozen day-1 reference must reproduce q247's (day1, day2) row
    exactly."""
    from pyspark.sql import functions as F

    from file_appender_spark.operators.drift import (
        reference_fractions,
        tvd_monitor_batch,
    )
    from file_appender_spark.queries import QUERIES
    from file_appender_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.floor(F.unix_micros("ts") / F.lit(86400000000))
        .cast("long")
        .alias("d"),
        "event_type",
    )
    days = sorted(r["d"] for r in ev.select("d").distinct().collect())
    d1, d2 = days[0], days[1]
    ref = reference_fractions(ev.filter(F.col("d") == d1), "event_type")
    got = tvd_monitor_batch(ev.filter(F.col("d") == d2), "event_type", ref)
    want = {
        (r["day_from"], r["day_to"]): r["tvd"]
        for r in QUERIES["q247_daily_tvd"].spark_fn(spark, sf_dir).collect()
    }[(d1, d2)]
    assert got["tvd"] == want


def test_tvd_monitor_streaming_foreachbatch(spark, tmp_path):
    """Drive the TVD monitor as a real foreachBatch stream: identical
    mix -> 0.0; disjoint mix -> 1.0; empty -> None."""
    import os

    from file_appender_spark.operators.drift import (
        reference_fractions,
        tvd_monitor_batch,
    )

    ref_df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 4, "event_type string"
    )
    ref = reference_fractions(ref_df, "event_type")
    same = tvd_monitor_batch(ref_df, "event_type", ref)
    assert same["tvd"] == 0.0
    disjoint = tvd_monitor_batch(
        spark.createDataFrame([("c",)] * 5, "event_type string"),
        "event_type",
        ref,
    )
    assert disjoint["tvd"] == 1.0
    empty = tvd_monitor_batch(
        ref_df.filter("event_type = 'zzz'"), "event_type", ref
    )
    assert empty["tvd"] is None

    d = str(tmp_path / "tvd_stream")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 2, "event_type string"
    ).coalesce(1).write.mode("overwrite").parquet(d + "_src")
    import glob
    import shutil

    for i, p in enumerate(sorted(glob.glob(d + "_src/part-*.parquet"))):
        shutil.copy(p, os.path.join(d, f"{i:02d}.parquet"))
    reports = []
    stream = (
        spark.readStream.format("parquet")
        .schema("event_type string")
        .load(d)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _i: reports.append(
                tvd_monitor_batch(b, "event_type", ref)
            )
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert reports and reports[0]["tvd"] == 0.0  # same 6:4 mix ratio
