"""Benford leading-digit profiling (operators/benford.py)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from file_appender_spark.operators.benford import (
    BENFORD_P,
    benford_deviation,
    leading_digit_profile,
)


def test_profile_counts_all_nine_digits(spark):
    vals = [1.0, 12.0, 0.13, -145.0, 9000.0, 0.0, None]
    df = spark.createDataFrame([(x,) for x in vals], "v double")
    rows = {r["digit"]: r for r in leading_digit_profile(df, "v").collect()}
    assert set(rows) == set(range(1, 10))
    assert rows[1]["n"] == 4  # 1, 12, 0.13, -145 (sign/zeros stripped)
    assert rows[9]["n"] == 1
    assert rows[5]["n"] == 0  # zero-count digits still reported
    assert abs(rows[1]["benford_p"] - round(math.log10(2), 6)) < 1e-9


def test_benford_conforming_vs_uniform(spark):
    rng = random.Random(7)
    # log-uniform across 6 magnitudes => Benford-conforming
    conf = spark.createDataFrame(
        [(10 ** rng.uniform(0, 6),) for _ in range(4000)], "v double"
    )
    # uniform [1, 2) => leading digit always 1, maximally non-conforming
    uni = spark.createDataFrame(
        [(1.0 + rng.random(),) for _ in range(4000)], "v double"
    )
    assert benford_deviation(conf, "v") < 0.01
    assert benford_deviation(uni, "v") > 1.0


def test_benford_empty_raises(spark):
    df = spark.createDataFrame([(0.0,), (None,)], "v double")
    with pytest.raises(ValueError, match="Benford"):
        benford_deviation(df, "v")
