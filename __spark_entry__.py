"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The actual inventory lives in ``file_appender_spark.queries`` — one
(spark_fn, oracle_sql) pair per implemented operator of SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# self-locating: the engine package lives next to this file; don't
# depend on the caller having put the repo root on sys.path
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from file_appender_spark.queries import QUERIES

    return QUERIES["q01_pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from file_appender_spark.queries import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each oracle-checkable query."""
    from file_appender_spark.queries import get_oracle_sql

    return get_oracle_sql()
