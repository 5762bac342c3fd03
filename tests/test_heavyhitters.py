"""Misra-Gries heavy hitters (operators/heavyhitters.py): the
candidate superset guarantee and exactness of the verified output."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from file_appender_spark.operators.heavyhitters import (
    _mg_fold,
    exact_heavy_hitters,
    misra_gries_candidates,
)


def _zipf_values(n: int, n_keys: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    # Zipf-ish (s=2): key i with weight 1/(i+1)^2 — dominant head
    # keys that clear even the k=5 threshold, plus a long tail
    weights = [1.0 / (i + 1) ** 2 for i in range(n_keys)]
    return [f"k{i}" for i in rng.choices(range(n_keys), weights, k=n)]


@pytest.mark.parametrize("seed", [1, 7])
@pytest.mark.parametrize("k", [5, 20])
def test_candidates_contain_every_true_heavy_hitter(spark, seed, k):
    vals = _zipf_values(20_000, 500, seed)
    df = spark.createDataFrame([(v,) for v in vals], "tok string").repartition(8)
    cands = {
        r["tok"] for r in misra_gries_candidates(df, "tok", k).collect()
    }
    counts = pd.Series(vals).value_counts()
    threshold = len(vals) / k
    true_hh = {t for t, c in counts.items() if c > threshold}
    assert true_hh, "fixture must actually contain heavy hitters"
    missing = true_hh - cands
    assert not missing, f"MG candidates lost true heavy hitters: {missing}"


def test_exact_heavy_hitters_equals_naive_group_by(spark):
    vals = _zipf_values(30_000, 300, seed=3)
    df = spark.createDataFrame([(v,) for v in vals], "tok string").repartition(16)
    k = 50
    got = {
        (r["tok"], r["cnt"])
        for r in exact_heavy_hitters(df, "tok", k).collect()
    }
    counts = pd.Series(vals).value_counts()
    want = {
        (t, int(c)) for t, c in counts.items() if c * k > len(vals)
    }
    assert got == want


def test_exact_heavy_hitters_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a",)] * 10 + [(None,)] * 90, "tok string"
    )
    rows = exact_heavy_hitters(df, "tok", 2).collect()
    # nulls are excluded from both candidates and the total: "a" is
    # 100% of the 10 non-null rows
    assert [(r["tok"], r["cnt"], r["freq"]) for r in rows] == [("a", 10, 1.0)]


def test_mg_fold_trims_to_k_minus_1():
    from collections import Counter

    c = Counter()
    _mg_fold(c, pd.Series([f"v{i}" for i in range(100)]), k=10)
    assert len(c) <= 9


def test_k_validation(spark):
    df = spark.createDataFrame([("a",)], "tok string")
    with pytest.raises(ValueError):
        misra_gries_candidates(df, "tok", 1)
