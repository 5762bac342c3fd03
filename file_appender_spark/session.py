"""SparkSession factory.

Local testing runs on ``local[N]`` but every default here is chosen
for a large multi-executor cluster: AQE (runtime re-planning, skew-join
splitting, partition coalescing), Arrow for every pandas interchange,
UTC session time so results are timezone-stable, and shuffle
partitions sized by environment rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "file_appender_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # runtime bloom-filter join pruning: shrink the shuffled big
        # side of selective joins (measured ~20% on the Q5 shape at
        # sf0.1); default-on in Spark 4, pinned here so a deployment
        # override can't silently regress join-heavy plans
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an externally-created
    session (the driver passes its own SparkSession to ``entry``).

    Only touches confs that are safe to set after startup.
    """
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # the 200 default over-parallelizes local runs; AQE coalesces
        # but planning/task overhead is real — size to the host
        "spark.sql.shuffle.partitions": str(DEFAULT_SHUFFLE_PARTITIONS),
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # conf may be static in some deployments
            pass
    return spark
