"""Run every registered oracle-checked query against DuckDB on the
smoke-scale data — the local mirror of the driver's t2 gate."""

from __future__ import annotations

import pytest

from file_appender_spark.oracle import compare
from file_appender_spark.queries import QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.spark_fn(spark, sf_dir)
    assert df is not None
    if spec.oracle is None:
        # rows-only check, like the driver's weaker path
        assert df.count() >= 0
        return
    ok, diag = compare(df, spec.oracle, sf_dir)
    assert ok, f"{name}: {diag}"


def test_q114_planted_leak_matches_oracle_nonempty(spark, tmp_path):
    """The driver corpus is honestly leak-free at the gate scale, so
    q114's driver row is a 0-row match. This exercises the SAME
    spark-vs-oracle compare on a planted-leak parquet fixture: two
    duplicate texts whose doc_ids hash into different splits, so the
    report MUST be non-empty and still hash-match DuckDB."""
    import hashlib

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100

    train_ids = [i for i in range(1, 400) if bucket(i) < 80]
    test_ids = [i for i in range(1, 400) if bucket(i) >= 90]
    assert len(train_ids) >= 2 and len(test_ids) >= 2
    rows = [
        (train_ids[0], "the quick brown fox jumps over the lazy dog"),
        (test_ids[0], "the quick brown fox jumps over the lazy dog"),
        (train_ids[1], "an entirely innocent unrelated document"),
        (test_ids[1], "another unique text that leaks nowhere"),
    ]
    sf = tmp_path / "sf_leak"
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(sf / "documents.parquet")
    )
    spec = QUERIES["q114_split_leakage"]
    df = spec.spark_fn(spark, str(sf))
    assert df.count() == 1  # exactly the planted duplicate pair
    ok, diag = compare(df, spec.oracle, str(sf))
    assert ok, diag
