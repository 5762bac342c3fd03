"""operators/containment.py: the capped scale path must agree with
the exact inverted-index form wherever its recall contract holds
(some shared token has df <= cap), carry EXACT containment values on
everything it returns (the cap affects recall, never precision), and
actually shrink the candidate space on a Zipf-shaped vocabulary."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from file_appender_spark.operators.containment import containment_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return {(r["d_sub"], r["d_super"], r["containment"]) for r in df.collect()}


def test_capped_equals_exact_when_rare_tokens_exist(spark):
    """Every doc here shares at least one rare token with its
    near-superset, so the cap loses nothing and values are equal."""
    rows = [
        (1, "the alpha beta gamma"),
        (2, "the alpha beta gamma delta epsilon zeta eta theta iota"),
        (3, "the kappa lunar mare nectar"),
        (4, "the kappa lunar mare nectar orbit polar quark rover solar"),
        (5, "the unrelated words entirely different"),
    ]
    df = _docs(spark, rows)
    exact = _pairs(containment_pairs(df, threshold=0.8))
    capped = _pairs(containment_pairs(df, threshold=0.8, token_df_cap=3))
    assert exact == capped
    assert (1, 2, 1.0) in exact and (3, 4, 1.0) in exact


def test_cap_affects_recall_never_precision(spark):
    """A doc made ONLY of corpus-ubiquitous tokens is the documented
    recall loss; every pair the capped form DOES return carries the
    exact containment value."""
    hot = "the and of to in"
    rows = [(i, f"{hot} word{i}a word{i}b") for i in range(1, 7)]
    rows.append((10, hot))  # all-hot subset of every other doc
    df = _docs(spark, rows)
    exact = _pairs(containment_pairs(df, threshold=0.9))
    # cap=6: the 5 hot tokens appear in 7 docs -> excluded from
    # candidate generation; word{i}x tokens have df=1
    capped = _pairs(containment_pairs(df, threshold=0.9, token_df_cap=6))
    missed = exact - capped
    # the ONLY misses are pairs whose sub-doc is the all-hot doc 10
    assert missed == {p for p in exact if p[0] == 10}
    assert missed  # the scenario genuinely exercises the contract
    # no fabricated pairs, and surviving values are bit-equal
    assert capped <= exact


def test_randomized_agreement_under_zipf_vocab(spark):
    """Random corpora with one ubiquitous token: capped(df<=cap
    keeping each doc's rare tokens) == exact, across seeds."""
    for seed in (3, 41):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(30)]
        rows = []
        for i in range(40):
            k = rng.randint(3, 8)
            toks = rng.sample(vocab, k) + ["the"]
            rng.shuffle(toks)
            rows.append((i, " ".join(toks)))
        # plant containment: doc 100 is a subset of doc 0's tokens
        base = rows[0][1].split()
        rows.append((100, " ".join(base[: max(3, len(base) - 2)])))
        df = _docs(spark, rows)
        exact = _pairs(containment_pairs(df, threshold=0.7))
        capped = _pairs(containment_pairs(df, threshold=0.7, token_df_cap=25))
        assert exact == capped, (seed, exact ^ capped)


def test_q129_delegates_to_operator(spark, sf_dir):
    """q129's registered form must be the operator's exact branch."""
    from file_appender_spark.queries import QUERIES
    from file_appender_spark.sources.catalog import load_table

    got = QUERIES["q129_containment"].spark_fn(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    want = containment_pairs(d, threshold=0.9, token_df_cap=None)
    assert _pairs(got) == _pairs(want)


def test_validation(spark):
    df = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="threshold"):
        containment_pairs(df, threshold=0.0)
    with pytest.raises(ValueError, match="token_df_cap"):
        containment_pairs(df, token_df_cap=0)
