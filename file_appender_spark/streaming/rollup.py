"""Continuous rollup: an incrementally-maintained aggregate table
(the "hypertable rollup" / materialized-view pattern).

A 100 TB event stream is never re-aggregated from scratch for a
dashboard — a streaming job maintains the rollup table and queries
read the small aggregate. Spark-first shape:

- the stream runs a watermarked windowed aggregation in UPDATE mode,
  so each micro-batch emits only the (window, key) rows whose
  aggregate changed — and each emitted row is the COMPLETE new value
  for its key (state holds the full aggregate), which makes the sink
  a pure replace-by-key upsert;
- ``foreachBatch`` merges those rows into a parquet table partitioned
  by window date: only the partitions containing changed windows are
  rewritten (dynamic partition overwrite), everything else is
  untouched. Rewrite cost is bounded by the watermark — windows older
  than it can no longer change, so old partitions go cold and the
  per-batch work is O(hot window data), independent of table age;
- replace-by-key is idempotent, so micro-batch replay after failure
  converges to the same table (at-least-once foreachBatch => exactly-
  once table contents).

The same function maintains the rollup in batch backfill (call
``merge_rollup_batch`` directly) — one code path for both, the
Lambda-architecture collapse Structured Streaming is built around.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_KEYS = ["window_start", "window_end", "event_type"]


def rollup_aggregate(events: DataFrame, window: str, watermark: str) -> DataFrame:
    """The rollup's defining aggregation (shared by stream and
    backfill): per (tumbling window, event_type) counts and sums."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def merge_rollup_batch(
    spark: SparkSession, updates: DataFrame, rollup_dir: str
) -> None:
    """Replace-by-key upsert of ``updates`` into the parquet rollup
    table, rewriting only the window-date partitions that changed.

    Parquet has no row-level MERGE; the scalable emulation is:
    restrict the existing table to the AFFECTED partitions (partition
    pruning — broadcast the handful of changed dates), anti-join out
    the keys being replaced, union the new rows, and rewrite just
    those partitions with dynamic partition overwrite."""
    updates = updates.withColumn("window_date", F.to_date("window_start")).persist()
    # eager: the upsert below overwrites the table some callers derive
    # `updates` from — pin the update rows BEFORE any file is replaced
    updates.count()
    # dynamic overwrite is scoped to this upsert: save + restore so the
    # shared session's overwrite semantics are untouched afterwards
    prior_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        merged = updates
        if os.path.exists(rollup_dir):
            dates = [r[0] for r in updates.select("window_date").distinct().collect()]
            existing = (
                spark.read.parquet(rollup_dir)
                # partition-pruned scan: only hot dates are read
                .filter(F.col("window_date").isin(dates))
                .join(updates.select(*ROLLUP_KEYS), on=ROLLUP_KEYS, how="left_anti")
            )
            merged = existing.unionByName(updates)
        (
            merged.repartition("window_date")
            .write.mode("overwrite")
            .partitionBy("window_date")
            .parquet(rollup_dir)
        )
    finally:
        if prior_mode is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prior_mode)
        updates.unpersist()


def continuous_rollup(
    events: DataFrame,
    rollup_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    query_name: str = "continuous_rollup",
):
    """Start the streaming maintenance job for the rollup table."""
    agg = rollup_aggregate(events, window, watermark)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_rollup_batch(batch_df.sparkSession, batch_df, rollup_dir)

    return (
        agg.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
