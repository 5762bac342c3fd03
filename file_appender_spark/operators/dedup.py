"""Deduplication operators (north-star mandate).

Exact dedup is a hash-groupBy with a declared representative — never
``dropDuplicates`` on unordered data, whose kept row depends on
partition scan order and is therefore nondeterministic at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def exact_dedup(
    df: DataFrame, content_col: str, id_col: str, hash_bits: int = 256
) -> DataFrame:
    """One row per distinct ``content_col`` value, keeping the row
    with the minimum ``id_col`` (deterministic representative).

    Scale: grouping on the sha2 hash gives perfectly balanced shuffle
    keys regardless of content skew."""
    h = F.sha2(F.col(content_col).cast("string"), hash_bits)
    w = W.partitionBy(h).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def keep_min_representative(
    df: DataFrame, group_cols: list[str], id_col: str
) -> DataFrame:
    """dropDuplicates(subset) with declared semantics: keep the
    min-``id_col`` row per group."""
    w = W.partitionBy(*group_cols).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def content_hash(col: str | Column, bits: int = 256) -> Column:
    """Content address for exact dedup / multimodal payloads."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, bits)
