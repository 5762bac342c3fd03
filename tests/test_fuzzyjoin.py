"""Blocked fuzzy self-join (operators/fuzzyjoin.py): exact recall vs
the all-pairs reference semantics, and the no-cross-join plan
contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from file_appender_spark.operators.fuzzyjoin import fuzzy_self_join


def _all_pairs(df, k):
    a = df.select(F.col("id").alias("id1"), F.col("nm").alias("nm1"))
    b = df.select(F.col("id").alias("id2"), F.col("nm").alias("nm2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("edit_dist", F.levenshtein("nm1", "nm2"))
        .filter(F.col("edit_dist") <= k)
        .select("id1", "id2", "edit_dist")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# edits of every flavor: substitution, insertion, deletion, prefix
# edit (shifts every segment), length change across the band edge,
# short strings (len < k+1), and far-apart strings
WORDS = [
    "analytics",
    "analytiks",      # substitution
    "analyticsx",     # insertion at end
    "xanalytics",     # insertion at front (shifts all segments)
    "analytic",       # deletion
    "nalytics",       # deletion at front
    "anlytics",       # deletion mid
    "spark",
    "spa",            # len 3 < k+1 when k=2? no, k+1=3 — boundary
    "sp",             # len 2 < k+1
    "s",
    "",               # empty string
    "sparkle",
    "shark",
    "completely-different-string",
    "completely-different-strong",
]


@pytest.mark.parametrize("k", [1, 2])
def test_blocked_matches_all_pairs_synthetic(spark, k):
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(WORDS)], "id int, nm string"
    )
    got = _rows(fuzzy_self_join(df, "id", "nm", max_dist=k))
    want = _rows(_all_pairs(df, k))
    assert got == want and len(want) > 0


def test_blocked_matches_all_pairs_supplier(spark, sf_dir):
    from file_appender_spark.sources.catalog import load_table

    df = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"), F.lower("s_name").alias("nm")
    )
    got = _rows(fuzzy_self_join(df, "id", "nm", max_dist=2))
    want = _rows(_all_pairs(df, 2))
    assert got == want and len(want) > 0


def test_plan_has_no_cross_join(spark):
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(WORDS)], "id int, nm string"
    )
    plan = fuzzy_self_join(df, "id", "nm", max_dist=2)._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_key_df_cap_bounds_candidates_and_keeps_selective_pairs(spark):
    # a degenerate corpus: one ubiquitous template + two diverse words
    rows = [(i, f"supplier#{i:09d}") for i in range(50)]
    rows += [(100, "zebra"), (101, "zebrb")]
    df = spark.createDataFrame(rows, "id int, nm string")
    capped = _rows(fuzzy_self_join(df, "id", "nm", max_dist=1, key_df_cap=5))
    # the selective pair (shares a sub-cap key) must survive the cap
    assert (100, 101, 1) in capped


def test_blocked_matches_all_pairs_random_corpora(spark):
    """Randomized recall check: corpora of random short strings plus
    random single/double edits of some of them — the blocked join
    must equal all-pairs on every draw. Spark jobs are too slow for
    per-example hypothesis, so this drives several seeded random
    corpora in one session (deterministic seeds, no flakes)."""
    import random

    for seed in (7, 42, 1337):
        rng = random.Random(seed)
        alphabet = "abcdef"
        base = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 10)))
            for _ in range(30)
        ]
        edited = []
        for s in rng.sample(base, 10):
            t = list(s)
            for _ in range(rng.randint(1, 2)):
                op = rng.choice(["sub", "ins", "del"])
                if op == "sub" and t:
                    t[rng.randrange(len(t))] = rng.choice(alphabet)
                elif op == "ins":
                    t.insert(rng.randint(0, len(t)), rng.choice(alphabet))
                elif op == "del" and t:
                    del t[rng.randrange(len(t))]
            edited.append("".join(t))
        rows = [(i, s) for i, s in enumerate(base + edited)]
        df = spark.createDataFrame(rows, "id int, nm string")
        for k in (1, 2):
            got = _rows(fuzzy_self_join(df, "id", "nm", max_dist=k))
            want = _rows(_all_pairs(df, k))
            assert got == want, f"seed={seed} k={k}"
