"""The declared query inventory (SURVEY.md §2 Part B).

Importing this package registers every query module. Each query is a
(spark_fn, oracle_sql) pair; the driver hash-compares the Spark result
with DuckDB running the oracle SQL over the same parquet tables.
"""

from file_appender_spark.queries.registry import (
    QUERIES,
    QuerySpec,
    get_queries,
    get_oracle_sql,
    register,
)

# import for side effect: populate the registry
from file_appender_spark.queries import relational  # noqa: E402,F401
from file_appender_spark.queries import aggregates  # noqa: E402,F401
from file_appender_spark.queries import windows  # noqa: E402,F401
from file_appender_spark.queries import functions_suite  # noqa: E402,F401
from file_appender_spark.queries import extras  # noqa: E402,F401
from file_appender_spark.queries import udf_suite  # noqa: E402,F401
from file_appender_spark.queries import llm  # noqa: E402,F401
from file_appender_spark.queries import pipeline  # noqa: E402,F401
from file_appender_spark.queries import profiling  # noqa: E402,F401

__all__ = [
    "QUERIES",
    "QuerySpec",
    "get_queries",
    "get_oracle_sql",
    "register",
]
