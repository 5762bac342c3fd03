"""Local mirror of the driver's DuckDB-oracle comparison: run a Spark
query and its oracle SQL side by side, canonicalize (sort columns by
name, sort rows, normalize value rendering), and diff. Used by
tests/test_queries_oracle.py to catch mismatches before the driver's
CORRECTNESS gate does.
"""

from __future__ import annotations

import datetime
import math
import os
from decimal import Decimal

import duckdb

from file_appender_spark.sources.catalog import TABLES


def _norm(v):
    if isinstance(v, Decimal):
        return f"{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # collapse -0.0 / 0.0 and render shortest round-trip form
        if v == 0:
            return "0.0"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register the driver tables as DuckDB views. Handles both a
    single parquet FILE per table (the driver's layout) and a
    Spark-written dataset DIRECTORY of part files (e.g. the 10x
    scale-probe replicas)."""
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            pattern = os.path.join(path, "*.parquet")
        elif os.path.exists(path):
            pattern = path
        else:
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')")
    return con


def oracle_decimal_columns(oracle_sql: str, sf_dir: str) -> list[str]:
    """Names of output columns the oracle SQL produces as an arrow
    decimal type (DuckDB HUGEINT / DECIMAL both arrive as decimal128).

    The driver's canonicalization distinguishes decimal128 from int64,
    so an oracle column that lands as decimal while Spark emits BIGINT
    hash-mismatches even when every value is numerically equal — the
    root cause of round 1's q04 red and all six round-2 reds. Pure
    DuckDB (no Spark session) so tests can sweep the full inventory
    cheaply."""
    import pyarrow as pa

    con = duckdb_connection(sf_dir)
    try:
        tbl = con.execute(oracle_sql).arrow()
    finally:
        con.close()
    return [f.name for f in tbl.schema if pa.types.is_decimal(f.type)]


def oracle_nonscalar_columns(oracle_sql: str, sf_dir: str) -> list[str]:
    """Names of output columns the oracle SQL produces as an arrow
    list/struct/map type.

    The driver canonicalizes EVERY query's result with a pandas
    ``sort_values`` over all columns; a list-typed column arrives as
    numpy arrays, which are unhashable, so the canonicalizer crashes
    (``TypeError: unhashable type: 'numpy.ndarray'`` — the root cause
    of round 3's q66 and q140 reds). Same sweep shape as
    :func:`oracle_decimal_columns`: pure DuckDB, no Spark session."""
    import pyarrow as pa

    con = duckdb_connection(sf_dir)
    try:
        tbl = con.execute(oracle_sql).arrow()
    finally:
        con.close()
    return [
        f.name
        for f in tbl.schema
        if pa.types.is_nested(f.type)  # list / large_list / struct / map / union
    ]


def spark_nonscalar_columns(spark_df) -> list[str]:
    """Names of Spark result columns with array/struct/map type — the
    Spark-side half of the non-scalar tripwire (q66 had NO oracle, so
    an oracle-only sweep would have missed it)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def _decimal_mismatch(spark_df, duck_cols, duck_rows) -> str | None:
    """Data-level tripwire: a column where exactly one side is Decimal
    is a guaranteed driver hash-mismatch even if values are equal."""
    from pyspark.sql.types import DecimalType

    spark_dec = {
        f.name for f in spark_df.schema.fields if isinstance(f.dataType, DecimalType)
    }
    duck_dec = set()
    for row in duck_rows[:100]:
        for c, v in zip(duck_cols, row):
            if isinstance(v, Decimal):
                duck_dec.add(c)
    bad = spark_dec.symmetric_difference(duck_dec)
    if bad:
        return (
            f"decimal-type mismatch on {sorted(bad)}: spark decimal cols="
            f"{sorted(spark_dec)}, oracle decimal cols={sorted(duck_dec)} — "
            "the driver hashes Decimal and int64/double differently; "
            "CAST the oracle column (usually sum(int) -> HUGEINT) to BIGINT/DOUBLE"
        )
    return None


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    """Return (match, diagnostic)."""
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]
    con = duckdb_connection(sf_dir)
    res = con.execute(oracle_sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    dec_diag = _decimal_mismatch(spark_df, duck_cols, duck_rows)
    if dec_diag:
        return False, dec_diag
    if len(spark_rows) != len(duck_rows):
        return False, f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    a = canonical_rows(spark_cols, spark_rows)
    b = canonical_rows(duck_cols, duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(spark_rows)} rows)"
