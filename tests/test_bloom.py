"""Bloom-filter semi-join pruning (operators/bloom.py): no false
negatives, real pruning power, and exact-join equivalence."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from file_appender_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_params,
    bloom_prefilter,
)


def test_params_sizing():
    m, k = bloom_params(10_000, fpp=0.01)
    assert m % 64 == 0
    assert 6 <= k <= 8  # ~ -log2(0.01)
    assert bloom_params(0) == (64, 1)


def test_no_false_negatives(spark):
    keys = [f"key{i}" for i in range(2000)]
    kdf = spark.createDataFrame([(v,) for v in keys], "v string")
    m, k = bloom_params(len(keys), 0.01)
    words = bloom_build(kdf, "v", m, k)
    got = kdf.filter(bloom_might_contain("v", words, k)).count()
    assert got == len(keys), "a Bloom filter must never reject a member"


def test_false_positive_rate_in_range(spark):
    keys = [f"key{i}" for i in range(5000)]
    others = [f"other{i}" for i in range(20000)]
    kdf = spark.createDataFrame([(v,) for v in keys], "v string")
    odf = spark.createDataFrame([(v,) for v in others], "v string")
    m, k = bloom_params(len(keys), 0.01)
    words = bloom_build(kdf, "v", m, k)
    fp = odf.filter(bloom_might_contain("v", words, k)).count()
    # target 1%; allow generous slack for hash variance
    assert fp / len(others) < 0.05, fp


def test_prefilter_plus_exact_join_equals_unpruned(spark):
    """The semi-join-reduction contract: pruning then joining exactly
    equals the unpruned join, row for row."""
    rng = random.Random(5)
    big = [(i, f"g{rng.randrange(3000)}") for i in range(30000)]
    small = [(f"g{i}",) for i in range(0, 3000, 7)]
    bdf = spark.createDataFrame(big, "id long, g string")
    sdf = spark.createDataFrame(small, "g string")

    exact = bdf.join(sdf, "g").select("id", "g")
    pruned = bloom_prefilter(bdf, "g", sdf, "g", fpp=0.01).join(
        sdf, "g"
    ).select("id", "g")
    a = sorted((r["id"], r["g"]) for r in exact.collect())
    b = sorted((r["id"], r["g"]) for r in pruned.collect())
    assert a == b


def test_prefilter_actually_prunes(spark):
    """With a selective key set the prefilter must remove most rows
    BEFORE the join — the whole point of the operator."""
    big = [(i, f"g{i % 1000}") for i in range(20000)]
    small = [("g1",), ("g2",), ("g3",)]
    bdf = spark.createDataFrame(big, "id long, g string")
    sdf = spark.createDataFrame(small, "g string")
    kept = bloom_prefilter(bdf, "g", sdf, "g", fpp=0.01).count()
    # 3 of 1000 distinct keys -> ~60 true rows; allow fp slack
    assert kept < 2000, kept


def test_probe_is_expression_only(spark):
    """The probe must not add joins or shuffles to the pruned plan."""
    keys = spark.createDataFrame([(f"k{i}",) for i in range(100)], "v string")
    big = spark.createDataFrame([(f"k{i % 200}",) for i in range(1000)], "v string")
    pruned = bloom_prefilter(big, "v", keys, "v")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_build_validates_word_alignment(spark):
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError):
        bloom_build(df, "v", 100, 3)


def test_prefilter_rejects_mismatched_key_types(spark):
    """String-hashing double 1.0 vs int 1 would be a silent false
    negative — the operator must refuse mismatched types outright."""
    bdf = spark.createDataFrame([(1.0,)], "g double")
    sdf = spark.createDataFrame([(1,)], "g int")
    with pytest.raises(ValueError, match="types must match"):
        bloom_prefilter(bdf, "g", sdf, "g")
