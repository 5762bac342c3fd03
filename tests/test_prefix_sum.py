"""Two-phase distributed prefix sum (operators/prefix_sum.py) must
produce exactly the naive global-window result — same values, while
never range-shuffling the data into one partition."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from file_appender_spark.operators.prefix_sum import global_running_sum
from file_appender_spark.sources.catalog import load_table


def _naive(df, order_col, value_col, out_col, cast):
    w = W.orderBy(order_col).rowsBetween(W.unboundedPreceding, 0)
    return df.withColumn(out_col, F.sum(F.col(value_col).cast(cast)).over(w))


def test_matches_naive_window_double(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    got = {
        r["o_orderkey"]: r["run"]
        for r in global_running_sum(
            o, "o_orderkey", "o_totalprice", out_col="run"
        ).collect()
    }
    want = {
        r["o_orderkey"]: r["run"]
        for r in _naive(o, "o_orderkey", "o_totalprice", "run", "double").collect()
    }
    assert len(got) == len(want)
    # identical summation order (key order) on both paths => exact
    # equality would normally hold, but the pandas path accumulates in
    # a numpy double while Catalyst folds jvm doubles — compare to 1e-6
    assert all(abs(got[k] - want[k]) < 1e-6 for k in want)


def test_matches_naive_window_integral_exact(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    out = global_running_sum(e, "event_id", "user_id", out_col="run")
    assert dict(out.dtypes)["run"] == "bigint"
    got = {r["event_id"]: r["run"] for r in out.collect()}
    want = {
        r["event_id"]: r["run"]
        for r in _naive(e, "event_id", "user_id", "run", "bigint").collect()
    }
    assert got == want  # integral path must be bit-exact


def test_no_single_partition_exchange_of_data(spark, sf_dir):
    """The data path must never collapse to one partition; only the
    per-partition totals (bounded by partition count) may."""
    o = load_table(spark, sf_dir, "orders")
    out = global_running_sum(o, "o_orderkey", "o_totalprice", out_col="run")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the data path: hash partitioning on the pure bucket expression
    # (r5 rework: deterministic quantile buckets replaced the sampled
    # repartitionByRange + persist barrier) -> sort -> MapInPandas,
    # joined by broadcast — no SinglePartition anywhere on it
    assert "Exchange hashpartitioning(_pid" in plan
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan
    # exactly one SinglePartition exchange, and it sits inside the
    # broadcast (offsets) subtree over the n_buckets-row aggregate
    assert plan.count("Exchange SinglePartition") == 1
    assert plan.index("Exchange SinglePartition") > plan.index("BroadcastExchange")
    # no cache barrier anywhere (the r4 leak)
    assert "InMemoryTableScan" not in plan


def test_preserves_other_columns_and_rowcount(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    out = global_running_sum(d, "doc_id", "n_chars", out_col="cum_chars")
    assert out.count() == d.count()
    assert set(out.columns) == set(d.columns) | {"cum_chars"}


def test_nulls_skip_like_sql_sum(spark):
    """NULL values contribute 0 to the running total (SQL SUM
    semantics) on both the integral and double paths — the integral
    path must not raise on NaN->int64."""
    rows = [(1, 10), (2, None), (3, 5), (4, None), (5, 1)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(3)
    got = {
        r["k"]: r["run"]
        for r in global_running_sum(df, "k", "v", out_col="run").collect()
    }
    assert got == {1: 10, 2: 10, 3: 15, 4: 15, 5: 16}
