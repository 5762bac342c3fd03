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
from file_appender_spark.oracle import (
    oracle_decimal_columns,
    oracle_nonscalar_columns,
    spark_nonscalar_columns,
)
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


# ---------------------------------------------------------------------------
# Non-scalar tripwire (round-3 failure shape): the driver canonicalizes
# EVERY query — including "rows-only by design" ones — with a pandas
# sort over all columns, and list-typed columns arrive as unhashable
# numpy arrays, crashing it (q66's approx_iqr, q140's changed_cols).
# Sweep both sides: every oracle's arrow schema AND every registered
# Spark query's result schema must be scalar-only.
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_no_oracle_emits_nonscalar():
    offenders = {}
    for name, sql in sorted(get_oracle_sql().items()):
        cols = oracle_nonscalar_columns(sql, SF_DIR)
        if cols:
            offenders[name] = cols
    assert not offenders, (
        "oracle columns arriving as arrow list/struct/map — the driver "
        f"canonicalizer crashes on these: {offenders} — flatten with "
        "array_to_string(...) / struct field projection"
    )


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_no_spark_query_emits_nonscalar(spark):
    """Plan-only sweep (no execution): build every registered query's
    DataFrame and reject array/struct/map output columns. Catches the
    q66 shape, which has NO oracle and so escapes the DuckDB sweep."""
    from file_appender_spark.queries import QUERIES

    offenders = {}
    for name, spec in sorted(QUERIES.items()):
        df = spec.spark_fn(spark, SF_DIR)
        cols = spark_nonscalar_columns(df)
        if cols:
            offenders[name] = cols
    assert not offenders, (
        "Spark result columns with array/struct/map type — the driver "
        f"canonicalizer crashes on these: {offenders} — flatten with "
        "array_join / element_at / per-field projection"
    )


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_nonscalar_tripwire_catches_unflattened_array(spark):
    """The detector must go red on the exact r3 bug shapes: an
    un-flattened list column on either engine."""
    # oracle side: q140's original shape (list_filter result, no
    # array_to_string)
    cols = oracle_nonscalar_columns(
        "SELECT doc_id, list_filter(['a', 'b'], x -> x IS NOT NULL) AS l "
        "FROM documents LIMIT 5",
        SF_DIR,
    )
    assert cols == ["l"]
    # spark side: q66's original shape (percentile_approx with a list
    # of percentages returns array<double>)
    from pyspark.sql import functions as F

    df = (
        spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", [0.25, 0.75]
            ).alias("approx_iqr")
        )
    )
    assert spark_nonscalar_columns(df) == ["approx_iqr"]
