"""As-of join — Spark lacks a native one (SURVEY.md §2 Part B joins
row); this is the sort-merge union implementation.

For each left row, attach the latest right row with
``right.ts <= left.ts`` (inclusive) within the same key group:
tag both sides, union, window per key ordered by (ts, side) with
right-before-left at equal ts, carry right values forward with
``last(ignorenulls)``.

Scale: ONE shuffle on the key column and a single sort — no range
explosion, no per-group pandas, works at any key cardinality. This is
the 100 TB-safe formulation (a broadcast range join would blow up on
dense right sides; ``pd.merge_asof`` per group dies on skewed keys).

Determinism: callers must ensure at most one right row per (key, ts)
— pre-aggregate the right side if needed (q13 does max(event_id)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
    inclusive: bool = True,
    tolerance=None,
) -> DataFrame:
    """Return ``left`` with ``value_cols`` from the as-of-matched
    ``right`` row (null when no prior right row exists).

    ``tolerance`` bounds the match staleness (DuckDB/pandas
    ``merge_asof`` tolerance semantics): a matched right row older
    than ``left.ts - tolerance`` yields nulls instead. Pass a number
    for numeric ts columns or an SQL interval string (e.g.
    ``"15 minutes"``) for timestamps. Implemented by carrying the
    matched right timestamp inside the payload struct and nulling the
    values after the carry — the plan still has ONE shuffle and no
    range join."""
    if "_rts" in value_cols or "_rts" in (on, ts):
        raise ValueError(
            "asof_join reserves the column name '_rts' to carry the "
            "matched right timestamp for the tolerance check — rename "
            "that column before joining"
        )
    if isinstance(tolerance, str):
        try:
            # F.expr() builds lazily; spark.sql() parses + analyzes
            # eagerly, so a malformed interval fails HERE with a clear
            # message naming the argument, not deep in the query plan
            left.sparkSession.sql(f"SELECT INTERVAL {tolerance}")
        except Exception as e:
            raise ValueError(
                f"asof_join tolerance {tolerance!r} is not a valid SQL "
                f"interval string (expected e.g. '15 minutes'): {e}"
            ) from None
    l_cols = left.columns
    # right values travel inside ONE struct: the struct itself is
    # non-null for every right row (even when the value columns are
    # null), so a genuinely-NULL right value is distinguishable from
    # the placeholder nulls injected for left rows and is carried
    # as-is instead of being skipped for a stale older value. The
    # matched right ts rides along as _rts for the tolerance check.
    payload = F.struct(
        F.col(ts).alias("_rts"), *[F.col(c) for c in value_cols]
    ).alias("_payload")
    tagged_r = right.select(
        on,
        ts,
        payload,
        F.lit(0 if inclusive else 1).alias("_side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in l_cols
            if c not in (on, ts)
        ],
    )
    payload_type = tagged_r.schema["_payload"].dataType
    tagged_l = left.select(
        on,
        ts,
        F.lit(None).cast(payload_type).alias("_payload"),
        F.lit(1 if inclusive else 0).alias("_side"),
        *[F.col(c) for c in l_cols if c not in (on, ts)],
    )
    merged = tagged_r.unionByName(tagged_l)
    w = (
        W.partitionBy(on)
        .orderBy(ts, "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = merged.withColumn(
        "_asof", F.last("_payload", ignorenulls=True).over(w)
    )
    left_side = 1 if inclusive else 0
    out = carried.filter(F.col("_side") == left_side)
    if tolerance is None:
        fresh = F.lit(True)
    elif isinstance(tolerance, str):
        fresh = F.col("_asof._rts") >= F.col(ts) - F.expr(f"INTERVAL {tolerance}")
    else:
        fresh = F.col("_asof._rts") >= F.col(ts) - F.lit(tolerance)
    return out.select(
        *[c for c in l_cols],
        *[
            F.when(fresh, F.col(f"_asof.{c}")).alias(c)
            for c in value_cols
        ],
    )
