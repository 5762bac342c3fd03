"""Skew mitigation: salted aggregation (SURVEY.md §4 scale rules).

AQE's skew-join splitting handles joins; for aggregations with a few
hot keys this helper does the classic two-phase salt: partial-agg on
(key, salt) then final-agg on key. Exact for any algebraic aggregate
expressed as (partial, final) pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase aggregation over a salted key.

    ``partial_aggs`` run per (key, salt); ``final_aggs`` combine the
    partials per key (e.g. partial ``sum(x) AS s`` -> final
    ``sum(s) AS s``). The salt is a deterministic hash of a uniform
    row id substitute (``spark_partition_id`` + monotonic id would be
    nondeterministic across runs — the salt only affects intermediate
    grouping, never results, so pmod of a row hash is fine)."""
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts)).alias(
        "_salt"
    )
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(*partial_aggs)
    )
    return partial.groupBy(*group_cols).agg(*final_aggs)
