"""Degenerate-input guards (round-6 review findings): Spark 4 runs
ANSI-on, so an unguarded divide-by-zero CRASHES where the DuckDB
oracle yields NULL. These fixtures pin the guarded NULL on both
engines via the same compare() the driver uses."""

from __future__ import annotations

from file_appender_spark.oracle import compare
from file_appender_spark.queries import QUERIES


def _docs_dir(spark, tmp_path, rows):
    sf = tmp_path / "sf_guard"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(sf / "documents.parquet"))
    return str(sf)


def _events_dir(spark, tmp_path, rows):
    sf = tmp_path / "sf_guard_ev"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(sf / "events.parquet"))
    return str(sf)


def test_q215_all_one_group_yields_null_z(spark, tmp_path):
    """Every doc English: nb=0 zeroes the z denominator — guarded
    NULL on both engines, not an ANSI DIVIDE_BY_ZERO crash."""
    rows = [(i, f"text {i}", "en", "src0", 10 + i) for i in range(20)]
    sf = _docs_dir(spark, tmp_path, rows)
    spec = QUERIES["q215_mann_whitney"]
    df = spec.spark_fn(spark, sf)
    got = df.collect()[0]
    assert got["z"] is None and got["nb"] == 0
    ok, diag = compare(df, spec.oracle, sf)
    assert ok, diag


def test_q222_constant_activity_yields_null_rho(spark, tmp_path):
    """Every user has the same event count: zero rank variance on x —
    guarded NULL rho on both engines."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (u * 10 + i, t0 + datetime.timedelta(hours=u * 24 + i), u, "view",
         1.0 + u + i, "{}")
        for u in range(5)
        for i in range(3)  # exactly 3 events per user
    ]
    sf = _events_dir(spark, tmp_path, rows)
    spec = QUERIES["q222_spearman"]
    df = spec.spark_fn(spark, sf)
    got = df.collect()[0]
    assert got["rho"] is None
    ok, diag = compare(df, spec.oracle, sf)
    assert ok, diag


def test_q210_single_day_series_yields_null_acf(spark, tmp_path):
    """All events on one day: every lag has zero overlap pairs or
    zero variance — the guarded NULL path, and the compare holds."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), 1, "view", 1.0, "{}")
        for i in range(10)
    ]
    sf = _events_dir(spark, tmp_path, rows)
    spec = QUERIES["q210_daily_acf"]
    df = spec.spark_fn(spark, sf)
    df.collect()  # must not raise
    ok, diag = compare(df, spec.oracle, sf)
    assert ok, diag


def test_q235_single_source_yields_null_nmi(spark, tmp_path):
    """One source: H(S)=0 zeroes the NMI denominator — guarded NULL,
    purity still defined (1.0), compare holds."""
    rows = [
        (i, f"totally unique document number {i} with words {i * 7}", "en",
         "src0", 40)
        for i in range(12)
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    spec = QUERIES["q235_cluster_purity"]
    df = spec.spark_fn(spark, sf)
    got = df.collect()[0]
    assert got["nmi"] is None and got["purity"] == 1.0
    ok, diag = compare(df, spec.oracle, sf)
    assert ok, diag


def test_q243_constant_lengths_yield_null_alpha(spark, tmp_path):
    """All documents the same length: every tail log term is 0, so
    the Hill sum is 0 — guarded NULL alpha on both engines."""
    rows = [(i, "word " * 10, "en", "src0", 50) for i in range(40)]
    sf = _docs_dir(spark, tmp_path, rows)
    spec = QUERIES["q243_hill_tail_index"]
    df = spec.spark_fn(spark, sf)
    got = df.collect()[0]
    assert got["hill_alpha"] is None
    ok, diag = compare(df, spec.oracle, sf)
    assert ok, diag


def test_q246_degenerate_marginals_yield_null_kappa(spark, tmp_path):
    """One label class AND a constant predictor: pe == 1, so the
    kappa denominator is 0 — guarded NULL on both engines."""
    rows = [(i, f"xyzzy{i} quux{i}", "en", "src0", 20) for i in range(10)]
    sf = _docs_dir(spark, tmp_path, rows)
    spec = QUERIES["q246_lang_kappa"]
    df = spec.spark_fn(spark, sf)
    got = df.collect()[0]
    assert got["kappa"] is None and got["n_agree"] == 10
    ok, diag = compare(df, spec.oracle, sf)
    assert ok, diag


def test_q243_nonmultiple_count_matches_oracle(spark, tmp_path):
    """46 docs: DuckDB's float / would ROUND 4.6 to k=5 while Spark
    floors to 4 (review-confirmed divergence); with the oracle on
    floor division both engines agree."""
    rows = [
        (i, "w " * (i + 1), "en", "src0", i + 1) for i in range(46)
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    spec = QUERIES["q243_hill_tail_index"]
    df = spec.spark_fn(spark, sf)
    got = df.collect()[0]
    assert got["k_used"] == 4  # floor(46/10), never round(4.6)=5
    ok, diag = compare(df, spec.oracle, sf)
    assert ok, diag


def test_q246_disjoint_classes_kappa_zero(spark, tmp_path):
    """Labels all 'zh' (no marker set) while the detector tie-breaks
    everything to 'en': the marginal-overlap join is EMPTY, pe = 0,
    and kappa is a defined 0.0 — not NULL (review finding: the
    un-coalesced sum propagated NULL)."""
    rows = [(i, f"xx{i} yy{i} zz{i}", "zh", "src0", 12) for i in range(10)]
    sf = _docs_dir(spark, tmp_path, rows)
    spec = QUERIES["q246_lang_kappa"]
    df = spec.spark_fn(spark, sf)
    got = df.collect()[0]
    assert got["kappa"] == 0.0 and got["n_agree"] == 0
    ok, diag = compare(df, spec.oracle, sf)
    assert ok, diag


def test_q247_and_monitor_agree_on_null_categories(spark, tmp_path):
    """A NULL event_type must be a real category on BOTH surfaces:
    q247 coalesces it to '(null)' before the joins and the TVD
    monitor normalizes dict keys the same way, so the pinned
    monitor==q247 equivalence survives NULLs (review finding: the
    bare column vanished from q247's numerator but not its totals)."""
    import datetime

    from file_appender_spark.operators.drift import (
        reference_fractions,
        tvd_monitor_batch,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = (
        [(i, t0 + datetime.timedelta(minutes=i), 1, "a", 1.0, "{}")
         for i in range(10)]
        + [(100 + i, t0 + datetime.timedelta(minutes=30 + i), 1, None, 1.0,
            "{}") for i in range(5)]
        + [(200 + i, t0 + datetime.timedelta(days=1, minutes=i), 1, "a", 1.0,
            "{}") for i in range(10)]
    )
    sf = _events_dir(spark, tmp_path, rows)
    spec = QUERIES["q247_daily_tvd"]
    df = spec.spark_fn(spark, sf)
    q247 = {(r["day_from"], r["day_to"]): r["tvd"] for r in df.collect()}
    (pair, want), = q247.items()
    # day 1: 10 'a' + 5 NULL; day 2: 10 'a' -> NULL mass must count
    assert want == 0.333333
    ok, diag = compare(df, spec.oracle, sf)
    assert ok, diag

    from pyspark.sql import functions as F

    ev = QUERIES  # noqa: F841  (namespacing clarity only)
    from file_appender_spark.sources.catalog import load_table

    e = load_table(spark, sf, "events").select(
        F.floor(F.unix_micros("ts") / F.lit(86400000000)).cast("long").alias("d"),
        "event_type",
    )
    days = sorted(r["d"] for r in e.select("d").distinct().collect())
    ref = reference_fractions(e.filter(F.col("d") == days[0]), "event_type")
    got = tvd_monitor_batch(
        e.filter(F.col("d") == days[1]), "event_type", ref
    )
    assert got["tvd"] == want
