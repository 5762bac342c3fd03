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


def _floor_div(col: Column, w: int) -> Column:
    """Exact integral floor division: (a - pmod(a, w)) div w.

    Never float division — bucket keys in epoch nanos (~1e18) exceed
    double's exact-integer range (2^53), so F.floor(a / w) can land a
    point one bucket off its interval replica and silently drop the
    match."""
    a = col.cast("long")
    return ((a - F.pmod(a, F.lit(w))) / F.lit(w)).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    extra_on: Column | None = None,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= point < end`` (optionally ANDed with ``extra_on``,
    e.g. an equi-key). ``bucket_width`` must be a positive integer in
    the same units as the range columns (e.g. epoch seconds).

    Inner join only: the bucket-replication trick would emit one
    unmatched row PER REPLICA under outer semantics — an outer range
    join needs a post-dedup this operator deliberately doesn't hide.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    p = points.withColumn("_rj_bucket", _floor_div(F.col(point_col), bucket_width))
    # interval [start, end) overlaps buckets floor(start/w)..floor((end-1)/w);
    # empty intervals (end <= start) produce no buckets and drop out
    i = intervals.withColumn(
        "_rj_bucket",
        F.explode(
            F.when(
                F.col(end_col) > F.col(start_col),
                F.sequence(
                    _floor_div(F.col(start_col), bucket_width),
                    _floor_div(F.col(end_col) - 1, bucket_width),
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
    return p.join(i, cond, "inner").drop("_rj_bucket")
