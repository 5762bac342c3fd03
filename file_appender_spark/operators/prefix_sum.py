"""Distributed global prefix sum — running totals over a total order
WITHOUT a single-partition window (SURVEY.md §4 scale rules).

``Window.orderBy(key)`` with no partitionBy is the classic 100 TB
trap: Catalyst plans it as ``Exchange SinglePartition`` — every row
through one task. The two-phase formulation here is the textbook
fix (vector-model prefix sums / MPI exscan):

  1. range-partition by the order key (total order ACROSS partitions:
     partition i holds keys strictly below partition i+1's) and sort
     within each partition;
  2. per-partition local running sums in one pass (Arrow-batched
     ``mapInPandas`` carrying the accumulator across batches — no
     window, no extra shuffle);
  3. per-partition TOTALS (one row per partition) go through the tiny
     single-partition window — bounded by the partition count, not
     the row count — yielding each partition's starting offset;
  4. broadcast the offsets back and add.

Wall-clock is two linear passes plus an O(n_partitions) step, vs the
single-reducer sort of the naive window. This is the scale path for
q68-style packing when one shard key (e.g. lang='en' at 43% of the
corpus) is itself too big for one task.

Determinism note: ``repartitionByRange`` samples the data to pick
boundaries, so the ranged stage is persisted and both consumers (the
local cumsum and the per-partition totals) read the SAME
materialization — recomputing it per-branch could re-sample different
boundaries and silently mis-assign offsets. At true 100 TB the same
cut is made by writing stage 1 to storage and running stage 2 as a
second job; persist() is the single-cluster form of that barrier.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


def global_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact running ``sum(value_col)`` in ``order_col`` order, as one
    output column, with no single-partition shuffle of the data.

    ``order_col`` must be globally unique (range partitioning may
    split equal keys across partition boundaries, which would make
    the running total order-ambiguous — same contract as any
    deterministic cumulative aggregate). Integral value columns keep
    exact bigint arithmetic (cumulative counts at 100 TB exceed
    double's 2^53 integer range); everything else accumulates as
    double."""
    if num_partitions is None:
        try:
            num_partitions = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
            )
        except ValueError:  # e.g. AQE "auto"
            num_partitions = 32

    integral = df.schema[value_col].dataType.simpleString() in _INTEGRAL
    cum_type = "bigint" if integral else "double"
    zero = F.lit(0).cast(cum_type)

    ranged = (
        df.repartitionByRange(num_partitions, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in ranged.schema
    )
    out_schema = f"{fields}, `_local_cum` {cum_type}"
    dtype = "int64" if integral else "float64"

    def local_cumsum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one partition = one call; carry the accumulator across the
        # Arrow batches so the pass stays streaming
        carry = 0
        for pdf in batches:
            # NULLs contribute 0, matching SQL SUM's null-skipping
            # (and NaN→int64 would raise on the integral path)
            cum = pdf[value_col].fillna(0).astype(dtype).cumsum() + carry
            pdf = pdf.assign(_local_cum=cum)
            if len(cum):
                carry = cum.iloc[-1]
            yield pdf

    local = ranged.mapInPandas(local_cumsum, schema=out_schema)

    # per-partition totals: n_partitions rows — the ONLY thing that
    # ever passes through a single-partition window
    totals = ranged.groupBy("_pid").agg(
        F.sum(value_col).cast(cum_type).alias("_part_total")
    )
    w = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_part_total").over(w), zero).cast(cum_type).alias("_offset"),
    )

    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_local_cum") + F.col("_offset"))
        .drop("_pid", "_local_cum", "_offset")
    )
