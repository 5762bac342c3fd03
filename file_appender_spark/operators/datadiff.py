"""Dataset reconciliation: key-level diff of two versions of a table
— the operator behind every "what changed between yesterday's dump
and today's" question a pipeline answers before promoting data.

``table_diff`` reports one row per differing key: ``added`` (key only
in new), ``removed`` (key only in old), ``changed`` (key in both, any
non-key column differs null-safely) with the sorted list of changed
column names. Unchanged keys produce NO row, so the output is bounded
by the true change volume, not the table size.

Scale: ONE full-outer shuffle join on the key columns; the per-column
null-safe comparison is a codegen expression, and the changed-column
list is built from literals — no second pass, no collect. At 100 TB
both sides usually arrive bucketed/partitioned on the key, turning the
join co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def table_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Key-level diff. Returns ``keys + (change_type, changed_cols)``;
    value columns are compared null-safely on the intersection of the
    two schemas (columns present on only one side are compared as if
    the other side were all-null — they appear in changed_cols for
    every common key)."""
    if not keys:
        raise ValueError("table_diff needs at least one key column")
    for k in keys:
        if k not in old.columns or k not in new.columns:
            raise ValueError(f"key column {k!r} missing from one side")
    vals = sorted(
        (set(old.columns) | set(new.columns)) - set(keys)
    )

    def side(df: DataFrame, tag: str) -> DataFrame:
        cols = [F.col(k) for k in keys]
        for v in vals:
            col = F.col(v) if v in df.columns else F.lit(None)
            cols.append(col.alias(f"{tag}_{v}"))
        return df.select(*cols, F.lit(1).alias(f"_{tag}"))

    o = side(old, "o")
    n = side(new, "n")
    j = o.join(n, keys, "full_outer")

    changed_cols = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"o_{v}").eqNullSafe(F.col(f"n_{v}")), F.lit(v)
                )
                for v in vals
            ]
        )
    )
    change_type = (
        F.when(F.col("_o").isNull(), "added")
        .when(F.col("_n").isNull(), "removed")
        .when(F.size(changed_cols) > 0, "changed")
    )
    return (
        j.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .withColumn(
            "changed_cols",
            F.when(F.col("change_type") == "changed", changed_cols).otherwise(
                F.array().cast("array<string>")
            ),
        )
        .select(*keys, "change_type", "changed_cols")
    )


def schema_diff(old: DataFrame, new: DataFrame) -> dict:
    """Column-level schema drift: added / removed / type-changed
    column names (simple string DDL comparison) — the cheap check a
    pipeline runs before table_diff to decide whether a diff is even
    well-defined."""
    o = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    return {
        "added": sorted(set(n) - set(o)),
        "removed": sorted(set(o) - set(n)),
        "type_changed": sorted(
            c for c in set(o) & set(n) if o[c] != n[c]
        ),
    }
