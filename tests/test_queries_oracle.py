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
