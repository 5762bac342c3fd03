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
