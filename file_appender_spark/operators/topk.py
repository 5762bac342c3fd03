"""Top-k per group (SURVEY.md §2 Part B sort/limit/top-k row).

row_number over a TOTAL order + rank filter. Spark rewrites this into
WindowGroupLimit: each map task keeps only k rows per key before the
shuffle, so the exchanged volume is O(groups*k), not O(rows)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    w = W.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
