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


def test_leading_digit_matches_math_across_magnitudes(spark):
    """Pin the translate-then-first-char extraction against the
    MATHEMATICAL leading digit floor(|x| / 10^floor(log10 |x|))
    across 30 orders of magnitude — covers every rendering Spark
    produces (plain decimal, scientific with E+/E- exponents) so a
    future rendering change cannot silently skew the profile."""
    import math
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    vals = []
    for mag in range(-15, 16):
        for _ in range(20):
            vals.append(rng.uniform(1.0, 9.9999) * (10.0 ** mag))
    vals += [1.0, 9.999999999999998, 1e-15, 1e15, 123456.789, 0.001, 0.0001]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {
        r["v"]: r["d"]
        for r in df.select(
            "v",
            F.substring(
                F.translate(F.abs(F.col("v")).cast("string"), "0.-eE+", ""), 1, 1
            )
            .cast("int")
            .alias("d"),
        ).collect()
    }
    for v in vals:
        want = int(math.floor(abs(v) / 10.0 ** math.floor(math.log10(abs(v)))))
        # float log10 can misplace the exponent at exact powers; the
        # digit itself is what matters
        want = min(max(want, 1), 9)
        assert got[v] == want, (v, got[v], want)
