"""Exact distributed selection (operators/selection.py): agreement
with percentile_disc, duplicates, skew, tiny refine thresholds (to
force many bisection passes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from file_appender_spark.operators.selection import exact_quantile, kth_smallest


def test_matches_percentile_disc_on_orders(spark, sf_dir):
    from file_appender_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    for q in (0.0, 0.25, 0.5, 0.9, 0.99, 1.0):
        want = o.agg(
            F.expr(
                f"percentile_disc({q}) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias("v")
        ).first()["v"]
        got = exact_quantile(o, "o_totalprice", q)
        assert got == want, (q, got, want)


def test_bisection_path_with_tiny_refine(spark):
    """refine_rows=4 forces real bisection passes; heavy duplicates
    and skew must still land on the exact order statistic."""
    # modest value range keeps bisection to ~10 passes per call (the
    # pass count is log2(range/bracket), so a 1e9 range would cost
    # minutes of tiny Spark jobs here without changing coverage)
    vals = [1.0] * 50 + [2.0] * 30 + [60.0] * 19 + [-5.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    assert kth_smallest(df, "x", 1, refine_rows=4) == -5.0
    assert kth_smallest(df, "x", 52, refine_rows=4) == 2.0
    assert kth_smallest(df, "x", 82, refine_rows=4) == 60.0
    assert kth_smallest(df, "x", 100, refine_rows=8) == 60.0


def test_nulls_ignored_and_bounds_checked(spark):
    df = spark.createDataFrame([(1.0,), (None,), (3.0,)], "x double")
    assert kth_smallest(df, "x", 2) == 3.0
    with pytest.raises(ValueError, match="outside"):
        kth_smallest(df, "x", 3)
    with pytest.raises(ValueError, match="outside"):
        exact_quantile(df, "x", 1.5)


def test_random_corpora_match_percentile_disc(spark):
    """Seeded random corpora (duplicates + spread magnitudes): the
    bisection must agree with percentile_disc on every draw."""
    import random

    for seed in (11, 97):
        rng = random.Random(seed)
        vals = [round(rng.choice([1, 10, 100]) * rng.random(), 3) for _ in range(500)]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        for q in (0.1, 0.5, 0.95):
            want = df.agg(
                F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY x)").alias("v")
            ).first()["v"]
            got = exact_quantile(df, "x", q, refine_rows=50)
            assert got == want, (seed, q, got, want)


def test_pass_exhaustion_raises_instead_of_wrong_answer(spark):
    """When the pass budget runs out while the bracket still holds
    many distinct values, the operator must FAIL (its contract is
    exactness) rather than silently return the bracket top."""
    vals = [float(i) for i in range(1000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    with pytest.raises(RuntimeError, match="did not converge"):
        kth_smallest(df, "x", 500, refine_rows=1, max_passes=2)
    # the same call with budget converges to the exact statistic
    assert kth_smallest(df, "x", 500, refine_rows=64) == 499.0
