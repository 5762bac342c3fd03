"""Bucketized range join: equivalence with the naive theta join and
plan shape (equi-join shuffle, not a nested loop)."""

from __future__ import annotations

from pyspark.sql import functions as F

from file_appender_spark.operators.rangejoin import range_join
from file_appender_spark.sources.catalog import load_table


def make_sides(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("t")
    )
    # intervals derived from orders: [epoch, epoch + 1h)
    od = F.col("o_orderdate").cast("timestamp")  # parquet NTZ -> LTZ for unix_micros
    iv = load_table(spark, sf_dir, "orders").limit(200).select(
        "o_orderkey",
        F.unix_micros(od).alias("start"),
        (F.unix_micros(od) + 3_600_000_000).alias("end"),
    )
    return ev, iv


def test_range_join_matches_naive(spark, sf_dir):
    ev, iv = make_sides(spark, sf_dir)
    bucketed = range_join(
        ev, iv, point_col="t", start_col="start", end_col="end",
        bucket_width=3_600_000_000,
    )
    naive = ev.join(
        iv, (ev.t >= iv.start) & (ev.t < iv.end)
    )
    a = sorted((r["event_id"], r["o_orderkey"]) for r in bucketed.collect())
    b = sorted((r["event_id"], r["o_orderkey"]) for r in naive.collect())
    assert a == b


def test_range_join_is_equi_shuffle_not_nested_loop(spark, sf_dir):
    ev, iv = make_sides(spark, sf_dir)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = range_join(
            ev, iv, point_col="t", start_col="start", end_col="end",
            bucket_width=3_600_000_000,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_range_join_boundaries(spark):
    pts = spark.createDataFrame(
        [(1, 0), (2, 9), (3, 10), (4, 15), (5, 20)], "id long, t long"
    )
    iv = spark.createDataFrame([(100, 10, 20)], "iid long, start long, end long")
    out = range_join(pts, iv, "t", "start", "end", bucket_width=7)
    # half-open [10, 20): t=10 and 15 in; 9 and 20 out
    assert sorted(r["id"] for r in out.collect()) == [3, 4]


def test_range_join_empty_interval_drops(spark):
    pts = spark.createDataFrame([(1, 5)], "id long, t long")
    iv = spark.createDataFrame([(100, 5, 5)], "iid long, start long, end long")
    assert range_join(pts, iv, "t", "start", "end", bucket_width=10).count() == 0
