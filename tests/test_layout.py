"""Layout maintenance: compaction plans file count from measured
bytes; range clustering yields non-overlapping per-file key ranges
(the precondition for min/max skipping)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from file_appender_spark.operators.layout import (
    cluster_by,
    compact,
    dir_bytes,
    file_key_ranges,
    plan_file_count,
)
from file_appender_spark.sources.catalog import load_table


def _data_files(path: str) -> list[str]:
    return [
        f
        for f in glob.glob(os.path.join(path, "*.parquet"))
        if not os.path.basename(f).startswith(("_", "."))
    ]


def test_plan_file_count_orders_of_magnitude():
    mb = 1024 * 1024
    assert plan_file_count(0, 128) == 1
    assert plan_file_count(100 * mb, 128) == 1
    assert plan_file_count(129 * mb, 128) == 2
    assert plan_file_count(10_000 * mb, 128) == 79


def test_dir_bytes_matches_os(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    load_table(spark, sf_dir, "orders").write.parquet(src)
    expect = sum(os.path.getsize(f) for f in _data_files(src))
    assert dir_bytes(spark, src) == expect


def test_compact_reduces_small_files(spark, sf_dir, tmp_path):
    src, dst = str(tmp_path / "many"), str(tmp_path / "compacted")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(64).write.parquet(src)  # simulate a small-file mess
    assert len(_data_files(src)) == 64
    compact(spark, src, dst, target_file_mb=128)
    files = _data_files(dst)
    assert len(files) == 1  # sf data is far under one target file
    back = spark.read.parquet(dst)
    assert back.count() == orders.count()
    # value-preserving, not just count-preserving
    a = orders.groupBy().agg(F.sum("o_totalprice")).collect()[0][0]
    b = back.groupBy().agg(F.sum("o_totalprice")).collect()[0][0]
    assert abs(a - b) < 1e-6


def test_cluster_by_gives_disjoint_file_ranges(spark, sf_dir, tmp_path):
    dst = str(tmp_path / "clustered")
    orders = load_table(spark, sf_dir, "orders")
    cluster_by(orders, ["o_orderkey"], 8).write.parquet(dst)
    ranges = file_key_ranges(dst, "o_orderkey")
    assert len(ranges) == 8
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # non-overlapping => file-level skipping works
    # and the unsorted layout does NOT skip: ranges all overlap
    messy = str(tmp_path / "messy")
    orders.repartition(8).write.parquet(messy)
    messy_ranges = file_key_ranges(messy, "o_orderkey")
    overlaps = sum(
        1
        for (lo1, hi1), (lo2, hi2) in zip(sorted(messy_ranges), sorted(messy_ranges)[1:])
        if hi1 >= lo2
    )
    assert overlaps > 0


def _containing_fraction(ranges, value) -> float:
    """Fraction of files a point predicate on `value` must read."""
    hits = sum(1 for lo, hi in ranges if lo <= value <= hi)
    return hits / len(ranges)


def test_zorder_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    """The proof of the z-curve: after zorder_by on (custkey,
    totalprice), footer min/max ranges prune files for point
    predicates on EITHER column, while the linear cluster_by baseline
    prunes only its leading column (every file spans ~the full range
    of the other). Asserted from the same parquet footers a real
    scan's skipping logic consults."""
    from file_appender_spark.operators.layout import zorder_by

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    n_files = 8

    zdst = str(tmp_path / "zorder")
    zorder_by(orders, ["o_custkey", "o_totalprice"], n_files).write.parquet(zdst)
    ldst = str(tmp_path / "linear")
    cluster_by(orders, ["o_custkey"], n_files).write.parquet(ldst)

    med_ck, med_tp = (
        orders.agg(
            F.median("o_custkey").alias("ck"), F.median("o_totalprice").alias("tp")
        ).collect()[0]
    )

    z_ck = _containing_fraction(file_key_ranges(zdst, "o_custkey"), med_ck)
    z_tp = _containing_fraction(file_key_ranges(zdst, "o_totalprice"), med_tp)
    l_ck = _containing_fraction(file_key_ranges(ldst, "o_custkey"), med_ck)
    l_tp = _containing_fraction(file_key_ranges(ldst, "o_totalprice"), med_tp)

    # linear: perfect on the clustered column, blind on the other
    assert l_ck <= 2 / n_files
    assert l_tp == 1.0
    # z-order: real pruning on BOTH dimensions (8 files = 3 z-bits:
    # ideal uniform split reads 1/2 of files per single-column point
    # predicate; allow slack for quantile-sampling error)
    assert z_ck <= 0.75
    assert z_tp <= 0.75
    # and round-trips the data
    assert spark.read.parquet(zdst).count() == orders.count()
