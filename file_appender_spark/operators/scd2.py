"""SCD2 / CDC merge emulation without Delta/Iceberg (neither's jars
ship in this environment): MERGE INTO expressed as anti-join + union
+ window close-out — the classic parquet-only slowly-changing-
dimension pattern.

Scale: one shuffle on the business key; the dimension is rewritten
partition-wise (at 100 TB you partition the dimension by key range or
bucket so a merge touches only affected partitions; with Delta/Iceberg
on the classpath this operator would delegate to native MERGE)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    compare_cols: list[str],
    effective_col: str,
    run_ts,
    current_flag: str = "is_current",
    end_col: str = "end_ts",
) -> DataFrame:
    """Apply SCD-type-2 updates.

    ``dim`` rows: key, compare_cols, effective_col, end_col,
    current_flag. ``updates`` rows: key + compare_cols. For each
    changed or new key: close the old current row (end_ts = run_ts,
    is_current = false) and append a new current row effective at
    ``run_ts``. Unchanged rows pass through untouched. Deterministic:
    pure set logic, no order dependence."""
    run_ts_lit = F.lit(run_ts).cast(dim.schema[effective_col].dataType)

    changed_keys = (
        updates.alias("u")
        .join(
            dim.filter(F.col(current_flag)).alias("d"),
            F.col(f"u.{key}") == F.col(f"d.{key}"),
            "left",
        )
        .filter(
            F.col(f"d.{key}").isNull()  # brand-new key
            # null-safe per-column comparison: NULL vs '' (or any
            # separator-aligned concat collision) must count as a change
            | ~reduce(
                lambda a, b: a & b,
                [
                    F.col(f"u.{c}").eqNullSafe(F.col(f"d.{c}"))
                    for c in compare_cols
                ],
                F.lit(True),  # empty compare_cols: only new keys insert
            )
        )
        .select(F.col(f"u.{key}").alias(key), *[F.col(f"u.{c}").alias(c) for c in compare_cols])
    )

    # close out current rows whose key is in the changed set
    closed = (
        dim.alias("d")
        .join(changed_keys.select(key).alias("k"), key, "left_semi")
        .filter(F.col(current_flag))
        .withColumn(end_col, run_ts_lit)
        .withColumn(current_flag, F.lit(False))
    )
    untouched = dim.join(
        changed_keys.select(key), key, "left_anti"
    ).unionByName(
        # historical (non-current) rows of changed keys pass through
        dim.join(changed_keys.select(key), key, "left_semi").filter(
            ~F.col(current_flag)
        )
    )
    # new current rows carry the update's attributes; any dim column
    # not supplied by the update (outside key/compare/bookkeeping)
    # null-fills, so dims with extra columns — or an empty
    # compare_cols — still union cleanly
    special = {key, *compare_cols, effective_col, end_col, current_flag}
    new_rows = changed_keys.select(
        key,
        *compare_cols,
        run_ts_lit.alias(effective_col),
        F.lit(None).cast(dim.schema[end_col].dataType).alias(end_col),
        F.lit(True).alias(current_flag),
        *[
            F.lit(None).cast(dim.schema[c].dataType).alias(c)
            for c in dim.columns
            if c not in special
        ],
    )
    return untouched.unionByName(closed).unionByName(new_rows)


def latest_snapshot(dim: DataFrame, key: str, effective_col: str) -> DataFrame:
    """Point-in-time 'current' view of an SCD2 dimension (max
    effective row per key — total order by effective_col assumed)."""
    w = W.partitionBy(key).orderBy(F.desc(effective_col))
    return (
        dim.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
