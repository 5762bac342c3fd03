"""Skew mitigation: salted aggregation (SURVEY.md §4 scale rules).

AQE's skew-join splitting handles joins; for aggregations with a few
hot keys this helper does the classic two-phase salt: partial-agg on
(key, salt) then final-agg on key. Exact for any algebraic aggregate
expressed as (partial, final) pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase aggregation over a salted key.

    ``partial_aggs`` run per (key, salt); ``final_aggs`` combine the
    partials per key (e.g. partial ``sum(x) AS s`` -> final
    ``sum(s) AS s``). The salt is a deterministic hash of a uniform
    row id substitute (``spark_partition_id`` + monotonic id would be
    nondeterministic across runs — the salt only affects intermediate
    grouping, never results, so pmod of a row hash is fine)."""
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts)).alias(
        "_salt"
    )
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(*partial_aggs)
    )
    return partial.groupBy(*group_cols).agg(*final_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof big-big equi-join: salt the SKEWED (left) side with
    a per-row deterministic salt, replicate the other side once per
    salt value (explode of a literal range — a metadata-cheap row
    multiplication, NOT a broadcast), and join on (key, salt). Each
    hot key's rows now spread over ``n_salts`` shuffle partitions
    instead of hammering one reducer.

    Prefer AQE's runtime skew-join split (on by default in
    session.py) — it needs no replication. This operator is for the
    cases AQE can't fix: a single key so hot it exceeds one
    executor's memory even after split thresholds, or a skewed join
    feeding an operation that must not be re-planned. Exact for
    inner/left joins (each left row carries exactly one salt, each
    right row appears once per salt but matches only its salt's
    partition — no duplicate pairs). RIGHT/FULL would emit
    per-replica unmatched right rows (same pitfall as the bucketized
    range join) and are rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left only (got {how!r}): outer sides "
            "that were replicated would emit one unmatched row per salt"
        )
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = l_salted.join(r_salted, [*on, "_salt"], how)
    return out.drop("_salt")
