"""Weighted sampling: rerun-stable by construction, weight-respecting
in distribution, top-k plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from file_appender_spark.operators.sampling import weighted_sample
from file_appender_spark.sources.catalog import load_table


def test_weighted_sample_is_rerun_and_partitioning_stable(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").withColumn(
        "w", (F.col("n_chars") + 1).cast("double")
    )
    a = {r.doc_id for r in weighted_sample(d, 50, "w", "doc_id").collect()}
    b = {
        r.doc_id
        for r in weighted_sample(d.repartition(13), 50, "w", "doc_id").collect()
    }
    assert a == b and len(a) == 50
    # a different seed is a different (but equally stable) sample
    c = {r.doc_id for r in weighted_sample(d, 50, "w", "doc_id", seed="x").collect()}
    assert c != a


def test_weighted_sample_respects_weights(spark):
    """Two weight classes, 10:1 — the heavy class must dominate the
    sample far beyond its 50% row share (binomial bound: picking
    uniformly would give ~half; p(heavy) = 10/11 gives ~91%)."""
    rows = [(i, 10.0 if i % 2 == 0 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = weighted_sample(df, 200, "w", "id").collect()
    heavy = sum(1 for r in got if r.w == 10.0)
    assert heavy > 150  # E[heavy] ~ 182; uniform would be ~100


def test_weighted_sample_excludes_nonpositive_and_stratifies(spark):
    rows = [(i, float(i % 3), "s" + str(i % 4)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, w double, stratum string")
    got = weighted_sample(df, 5, "w", "id", stratify_by="stratum").collect()
    assert all(r.w > 0 for r in got)
    per = {}
    for r in got:
        per[r.stratum] = per.get(r.stratum, 0) + 1
    assert per == {"s0": 5, "s1": 5, "s2": 5, "s3": 5}


def test_weighted_sample_plan_is_topk(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").withColumn(
        "w", (F.col("n_chars") + 1).cast("double")
    )
    plan = (
        weighted_sample(d, 50, "w", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # never a global sort
    splan = (
        weighted_sample(d, 5, "w", "doc_id", stratify_by="lang")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in splan
