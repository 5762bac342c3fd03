"""Reusable operator implementations backing the query inventory.

Each operator is a plain function DataFrame -> DataFrame so it can be
composed like any Spark transformation. The queries/ package exercises
them through the oracle-checked inventory; the scale-path variants
(blocked similarity, IVF) are bench-only.
"""

from file_appender_spark.operators.asof import asof_join
from file_appender_spark.operators.dedup import exact_dedup, keep_min_representative
from file_appender_spark.operators.sessionize import sessionize
from file_appender_spark.operators.topk import top_k_per_group

__all__ = [
    "asof_join",
    "exact_dedup",
    "keep_min_representative",
    "sessionize",
    "top_k_per_group",
]
