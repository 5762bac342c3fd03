"""Sessionization: assign session ids by inactivity gap — the batch
twin of Structured Streaming's ``session_window`` (SURVEY.md §2
Part B streaming row; batch q37 exercises it with an oracle).

Implementation: lag(ts) per key -> new-session flag when the gap
exceeds the threshold -> running sum of flags = session index.
Scale: one shuffle on the key, two window passes over the same sort
order (Catalyst reuses the sort)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    order_tiebreak: str,
) -> DataFrame:
    """Add ``session_id`` (``<key>#<n>``, 0-based per key). The
    ordering (ts, tiebreak) must be total for determinism."""
    w = W.partitionBy(key).orderBy(ts, order_tiebreak)
    # microsecond-precise gap: unix_timestamp truncates to whole
    # seconds, which disagrees with sub-second event times around the
    # threshold (every driver events.ts has sub-second precision)
    gap_us = F.unix_micros(F.col(ts) if isinstance(ts, str) else ts) - F.unix_micros(
        F.lag(ts).over(w)
    )
    new_session = F.when(
        F.lag(ts).over(w).isNull() | (gap_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    run = (
        W.partitionBy(key)
        .orderBy(ts, order_tiebreak)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return df.withColumn("_new", new_session).withColumn(
        "session_idx", F.sum("_new").over(run) - 1
    ).drop("_new").withColumn(
        "session_id", F.concat_ws("#", F.col(key).cast("string"), F.col("session_idx"))
    )
