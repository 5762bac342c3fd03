"""Bucketized range join: point-in-interval joins where BOTH sides
are large (SURVEY.md §2 Part B theta/range join row covers the
broadcast case — q12; this operator is the big-big case where a
broadcast nested loop would be quadratic).

Technique: quantize the range dimension into fixed-width buckets.
Each interval replicates to every bucket it overlaps (cheap when
bucket_width ~ median interval length); each point maps to exactly
one bucket. The join becomes an EQUI-join on the bucket id — one
hash-partitioned shuffle — followed by the exact range predicate as
a post-filter. This is the standard interval-join strategy of
streaming engines (e.g. Flink interval joins) and of Spark's own
Databricks range-join optimization, expressed in plain DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
    extra_on: Column | None = None,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` (optionally ANDed with ``extra_on``,
    e.g. an equi-key). ``bucket_width`` must be a positive integer in
    the same units as the range columns (e.g. epoch seconds)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    p = points.withColumn(
        "_rj_bucket", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    # interval [start, end) overlaps buckets floor(start/w)..floor((end-1)/w);
    # empty intervals (end <= start) produce no buckets and drop out
    i = intervals.withColumn(
        "_rj_bucket",
        F.explode(
            F.when(
                F.col(end_col) > F.col(start_col),
                F.sequence(
                    F.floor(F.col(start_col) / bucket_width).cast("long"),
                    F.floor((F.col(end_col) - 1) / bucket_width).cast("long"),
                ),
            ).otherwise(F.array().cast("array<long>"))
        ),
    )
    cond = (
        (p["_rj_bucket"] == i["_rj_bucket"])
        & (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    )
    if extra_on is not None:
        cond = cond & extra_on
    return p.join(i, cond, how).drop("_rj_bucket")
