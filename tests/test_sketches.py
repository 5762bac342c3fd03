"""Sketch rollups: the two properties that make them trustworthy at
scale — (1) merging per-partition sketches gives the SAME answer as
one global pass (partition-proof), (2) estimates stay inside the
library's published accuracy envelope vs exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from file_appender_spark.operators.sketches import (
    hll_estimate,
    hll_rollup,
    kll_quantiles,
    kll_rollup,
    theta_overlap,
    theta_rollup,
)
from file_appender_spark.sources.catalog import load_table


def test_hll_merge_equals_single_pass_and_accuracy(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    # per-priority rollup (the persisted sketch table), merged to []
    rollup = hll_rollup(o, ["o_orderpriority"], "o_custkey")
    merged = hll_estimate(rollup, []).collect()[0]
    # single global pass over the raw data
    direct = (
        o.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("o_custkey", F.lit(12))
            ).alias("e")
        ).collect()[0]["e"]
    )
    # Register-level merge is lossless for equal lg_k, but the union
    # gadget (HLL_8) estimates marginally differently from a direct
    # HLL_4 build once past sparse mode — so: tightly close to the
    # single-pass estimate, and both inside the envelope vs exact.
    assert abs(merged["approx_distinct"] - direct) / direct < 0.02
    exact = o.select("o_custkey").distinct().count()
    assert abs(merged["approx_distinct"] - exact) / exact < 0.05  # lg_k=12 ~1.6% rse
    assert merged["n_rows"] == o.count()


def test_hll_partial_rollup_subset(spark, sf_dir):
    """Re-aggregating the sketch table to a key subset matches
    sketching that subset's raw rows directly (within the union
    gadget's estimator tolerance — see the note in the merge test)."""
    o = load_table(spark, sf_dir, "orders")
    withyear = o.withColumn("yr", F.year("o_orderdate"))
    rollup = hll_rollup(withyear, ["yr", "o_orderpriority"], "o_custkey")
    by_year = {
        r["yr"]: r["approx_distinct"]
        for r in hll_estimate(rollup, ["yr"]).collect()
    }
    for yr, est in list(by_year.items())[:2]:
        direct = (
            withyear.filter(F.col("yr") == yr)
            .agg(
                F.hll_sketch_estimate(
                    F.hll_sketch_agg("o_custkey", F.lit(12))
                ).alias("e")
            )
            .collect()[0]["e"]
        )
        assert abs(est - direct) / max(direct, 1) < 0.02, (yr, est, direct)
        exact = (
            withyear.filter(F.col("yr") == yr)
            .select("o_custkey")
            .distinct()
            .count()
        )
        assert abs(est - exact) / max(exact, 1) < 0.05, (yr, est, exact)


def test_kll_merged_quantiles_match_exact_within_rank_error(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rollup = kll_rollup(li, ["l_returnflag"], "l_extendedprice")
    q = kll_quantiles(rollup, [], [0.5, 0.95]).collect()[0]
    n = li.count()
    prices = li.select("l_extendedprice")
    # rank error: the value returned must sit within ~2x1.65% of the
    # requested rank in the exact ordered data
    for p, v in ((0.5, q["p50"]), (0.95, q["p95"])):
        rank = prices.filter(F.col("l_extendedprice") <= v).count() / n
        assert abs(rank - p) < 0.04, (p, v, rank)


def test_theta_overlap_matches_exact_sets(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    rollup = theta_rollup(o, ["o_orderstatus"], "o_custkey")
    est = theta_overlap(rollup, ["o_orderstatus"], "O", "F").collect()[0]
    a = {r[0] for r in o.filter("o_orderstatus = 'O'").select("o_custkey").collect()}
    b = {r[0] for r in o.filter("o_orderstatus = 'F'").select("o_custkey").collect()}
    for field, exact in (
        ("n_a", len(a)),
        ("n_b", len(b)),
        ("n_union", len(a | b)),
        ("n_inter", len(a & b)),
        ("n_a_only", len(a - b)),
    ):
        assert exact == 0 or abs(est[field] - exact) / max(exact, 1) < 0.06, (
            field,
            est[field],
            exact,
        )


def test_sketch_rows_are_small(spark, sf_dir, tmp_path):
    """The operational claim: a sketch row is KBs regardless of input
    size, so the rollup table is metadata-scale."""
    o = load_table(spark, sf_dir, "orders")
    rollup = hll_rollup(o, ["o_orderpriority"], "o_custkey")
    sizes = [len(r["hll"]) for r in rollup.select("hll").collect()]
    assert all(s < 64 * 1024 for s in sizes)
    # and it round-trips through parquet (it IS a table, not session state)
    dst = str(tmp_path / "sketches")
    rollup.write.parquet(dst)
    back = spark.read.parquet(dst)
    merged = hll_estimate(back, []).collect()[0]["approx_distinct"]
    exact = o.select("o_custkey").distinct().count()
    assert abs(merged - exact) / exact < 0.05


def test_theta_overlap_with_absent_key_is_empty_not_null(spark, sf_dir):
    """A key with no rows yields an EMPTY sketch (0 estimates, union
    == the present side) — not nulls, not an error."""
    o = load_table(spark, sf_dir, "orders")
    rollup = theta_rollup(o, ["o_orderstatus"], "o_custkey")
    est = theta_overlap(rollup, ["o_orderstatus"], "O", "NO_SUCH").collect()[0]
    assert est["n_b"] == 0 and est["n_inter"] == 0
    assert est["n_union"] == est["n_a"] == est["n_a_only"] > 0
