"""Pure-DuckDB tripwire over the full oracle inventory: no oracle SQL
may emit an arrow decimal column unless the matching Spark query is
declared to produce DecimalType for that column.

Why: DuckDB widens `sum()` over integer inputs to HUGEINT, which
arrives in arrow as decimal128(38,0). The driver's canonicalization
hashes decimal128 and int64 differently even for equal values, so an
un-cast integer sum in an oracle is a guaranteed CORRECTNESS red (the
single cause of round 1's q04 and all six round-2 reds). This test
needs NO Spark session, so it sweeps every registered oracle in
seconds — the bug class can never ship again.
"""

from __future__ import annotations

import os

import pytest

import file_appender_spark.queries  # noqa: F401  (trigger registration)
from file_appender_spark.oracle import oracle_decimal_columns
from file_appender_spark.queries.registry import get_oracle_sql

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")

# (query, column) pairs where the Spark side deliberately emits
# DecimalType, so a decimal oracle column is the *correct* match.
# Currently empty: every query emits BIGINT/DOUBLE for numerics.
ALLOWED_DECIMAL: set[tuple[str, str]] = set()


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_no_oracle_emits_unexpected_decimal():
    offenders = {}
    for name, sql in sorted(get_oracle_sql().items()):
        cols = [
            c
            for c in oracle_decimal_columns(sql, SF_DIR)
            if (name, c) not in ALLOWED_DECIMAL
        ]
        if cols:
            offenders[name] = cols
    assert not offenders, (
        "oracle columns arriving as decimal128 (DuckDB HUGEINT/DECIMAL) "
        f"without a DecimalType Spark twin: {offenders} — wrap each in "
        "CAST(... AS BIGINT) (integer sums) or CAST(... AS DOUBLE)"
    )


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_tripwire_catches_uncast_integer_sum():
    """The detector itself must go red on the exact bug shape it
    guards against: a bare sum() over an integer column."""
    cols = oracle_decimal_columns(
        "SELECT o_custkey, sum(o_orderkey) AS s FROM orders GROUP BY 1", SF_DIR
    )
    assert cols == ["s"]
    # and stay green once cast, mirroring the prescribed fix
    cols = oracle_decimal_columns(
        "SELECT o_custkey, CAST(sum(o_orderkey) AS BIGINT) AS s "
        "FROM orders GROUP BY 1",
        SF_DIR,
    )
    assert cols == []
