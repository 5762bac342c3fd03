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


def test_streaming_candidates_cover_true_heavy_hitters(spark, tmp_path):
    """Drive the sharded streaming MG over two micro-batches
    (maxFilesPerTrigger=1 forces real cross-batch state) and check
    the LAST emitted candidate set per shard covers every true heavy
    hitter of the full stream."""
    from file_appender_spark.operators.heavyhitters import (
        streaming_heavy_hitter_candidates,
    )

    d = tmp_path / "tok_stream"
    batches = [_zipf_values(5000, 200, seed=s) for s in (21, 22)]
    for i, vals in enumerate(batches):
        spark.createDataFrame([(v,) for v in vals], "tok string").coalesce(
            1
        ).write.mode("append" if i else "overwrite").parquet(str(d))

    stream = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    k = 20
    out = streaming_heavy_hitter_candidates(stream, "tok", k)
    q = (
        out.writeStream.format("memory")
        .queryName("hh_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    n_batches = len(q.recentProgress)
    q.stop()
    assert n_batches >= 2, "maxFilesPerTrigger must force >= 2 batches"

    # update-mode memory sink keeps EVERY emission; the operator's
    # guarantee is about each shard's FINAL state, so select only the
    # rows carrying the shard's max update sequence number — a union
    # over history would mask a later batch evicting a true HH
    all_vals = [v for b in batches for v in b]
    import pandas as pd

    counts = pd.Series(all_vals).value_counts()
    true_hh = {t for t, c in counts.items() if c > len(all_vals) / k}
    assert true_hh
    rows = spark.sql("SELECT shard, tok, upd FROM hh_stream").collect()
    max_upd: dict = {}
    for r in rows:
        max_upd[r["shard"]] = max(max_upd.get(r["shard"], 0), r["upd"])
    got = {r["tok"] for r in rows if r["upd"] == max_upd[r["shard"]]}
    missing = true_hh - got
    assert not missing, f"final MG state lost heavy hitters: {missing}"
