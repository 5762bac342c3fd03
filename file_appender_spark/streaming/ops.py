"""Structured Streaming operators over the events stream
(SURVEY.md §2 Part B streaming rows; the pom's ``cdap-data-streams``
parenthood, pom.xml:247, declares the reference usable in streaming
pipelines — this module is that capability, Spark-native).

Every operator takes/returns streaming DataFrames, so they compose
with any source (file, kafka, socket). Tests drive them with a file
source + memory sink + ``processAllAvailable`` (synchronous smoke),
which exercises the exact same incremental planner a 1000-executor
kafka job uses.

Scale notes: all stateful ops are keyed (state lives on executors,
sharded by the shuffle), watermarks bound state size, and the
append-text sink is driven through ``foreachBatch`` so each
micro-batch reuses the batch sink's election protocol with the batch
id as the logical run time.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_event_stream(
    spark: SparkSession, src_dir: str, fmt: str = "parquet"
) -> DataFrame:
    """File-source stream with the events schema (explicit — streaming
    sources never infer)."""
    return spark.readStream.format(fmt).schema(EVENT_SCHEMA).load(src_dir)


def windowed_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is set) window aggregation
    with a watermark: late events beyond the watermark are dropped and
    window state older than it is evicted."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win, "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Session-window aggregation per user (dynamic-length windows
    merging events closer than ``gap``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "30 minutes"
) -> DataFrame:
    """Stateful streaming dedup: drops records whose KEY was already
    seen within the watermark horizon (state auto-evicts beyond it).
    Uses dropDuplicatesWithinWatermark so a re-delivery with a
    re-stamped event time still dedups — plain dropDuplicates(keys+ts)
    would only catch exact (key, ts) duplicates."""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def running_totals_with_state(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a
    per-user running (count, sum(value)) carried across micro-batches
    — the arbitrary-state API the built-in aggs can't express (e.g.
    for decaying counters or fraud scores)."""
    import pandas as pd

    output_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, total double"

    def update(key, pdfs: Iterable["pd.DataFrame"], state):
        (user_id,) = key
        # GroupState.get is a PROPERTY (unlike transformWithState's
        # ValueState.get() method below): calling it raises
        # "'tuple' object is not callable" on the second micro-batch
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_prefix: str = "l",
    right_prefix: str = "r",
    lower: str = "0 seconds",
    upper: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: match right events to left events
    of the same key with ``l.ts <= r.ts <= l.ts + upper`` (e.g. clicks
    joined to the purchases they led to within 30 minutes).

    Both sides are watermarked so the join state is bounded: Spark
    buffers each side only until the other side's watermark passes the
    time-bound — the canonical stream-stream equi+range join
    (SURVEY.md §2 Part B streaming row; state sharded by the key).
    """
    l = left.select(
        F.col(key).alias(f"{left_prefix}_key"),
        F.col("ts").alias(f"{left_prefix}_ts"),
        F.col("event_id").alias(f"{left_prefix}_id"),
    ).withWatermark(f"{left_prefix}_ts", watermark)
    r = right.select(
        F.col(key).alias(f"{right_prefix}_key"),
        F.col("ts").alias(f"{right_prefix}_ts"),
        F.col("event_id").alias(f"{right_prefix}_id"),
    ).withWatermark(f"{right_prefix}_ts", watermark)
    cond = (
        (F.col(f"{left_prefix}_key") == F.col(f"{right_prefix}_key"))
        & (F.col(f"{right_prefix}_ts") >= F.col(f"{left_prefix}_ts") + F.expr(f"INTERVAL {lower}"))
        & (F.col(f"{right_prefix}_ts") <= F.col(f"{left_prefix}_ts") + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, "inner")


def stream_to_append_sink(
    events: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    separator: str = ",",
    file_prefix: str = "stream",
    query_name: str = "append_sink_stream",
):
    """Drive the batch append-text sink from a stream via
    ``foreachBatch`` — the streaming twin of the reference's batch
    sink (SURVEY.md §2 Part B streaming source/sink row). Each
    micro-batch appends into the same under-threshold files; the
    batch id serves as the logical run time (deterministic, monotonic),
    so age-based rotation stays reproducible."""
    from file_appender_spark.config import AppendSinkConfig
    from file_appender_spark.sinks.append_text import append_text

    cfg = AppendSinkConfig(
        output_dir=output_dir, file_prefix=file_prefix, field_separator=separator
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        append_text(batch_df, cfg, run_ts_ms=batch_id)

    return (
        events.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )


def running_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals on the Spark 4 stateful API
    (``transformWithStateInPandas``): typed ValueState per key,
    update-mode emission — the successor to applyInPandasWithState
    (same semantics as :func:`running_totals_with_state`, kept side
    by side so users can migrate API-by-API). Runtime requirement:
    the TWS state protocol speaks protobuf — in environments without
    ``google.protobuf`` (this container), the applyInPandasWithState
    twin is the supported path.

    Scale notes: state is one (count, sum) pair per user in the state
    store — O(keys), incrementally checkpointed; each micro-batch
    touches only the keys present in that batch. ValueState supports
    a TTL (``ttlDurationMs``) for keys that must expire at 100 TB
    cardinalities; unbounded user counts would set it."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n bigint, total double")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, total = 0, 0.0
            if self._state.exists():
                prev = self._state.get()
                n, total = int(prev[0]), float(prev[1])
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id bigint, n_events bigint, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def clamped_balance_with_state(events: DataFrame) -> DataFrame:
    """q202's saturated wallet state machine as a STREAMING operator
    (the production form the batch query's docstring promises):
    per-user balance clamped to [0, cap] carried across micro-batches
    via ``applyInPandasWithState``, emitting one row per event.

    Semantics are q202_clamped_balance's exactly — delta =
    floor(value*100+0.5) cents, negated for 'error' events; balance
    saturates at [0, _Q202_CAP] — and the batch==streaming
    equivalence is pinned in tests (the stream must deliver each
    user's events in event-time order across batches, which
    time-split input files provide; within a batch the update
    function sorts by (ts, event_id) itself)."""
    import pandas as pd

    from file_appender_spark.queries.tranche6 import _Q202_CAP

    output_schema = "user_id long, event_id long, balance_cents long"
    state_schema = "bal long"

    def update(key, pdfs: Iterable["pd.DataFrame"], state):
        (user_id,) = key
        (bal,) = state.get if state.exists else (0,)
        out_eid, out_bal = [], []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        import math

        for _, row in pdf.iterrows():
            d = int(math.floor(float(row["value"]) * 100 + 0.5))
            if row["event_type"] == "error":
                d = -d
            bal = min(max(bal + d, 0), _Q202_CAP)
            out_eid.append(int(row["event_id"]))
            out_bal.append(bal)
        state.update((bal,))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_eid),
                "event_id": out_eid,
                "balance_cents": out_bal,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def corpus_fingerprint_stream(docs: DataFrame) -> DataFrame:
    """q224's corpus fingerprint as a STREAMING aggregation: per-source
    XOR of 60-bit md5 prefixes plus doc/char counts, maintained
    incrementally across micro-batches by Spark's stateful aggregation
    (run with outputMode 'complete' or 'update'). XOR's commutativity
    is what makes the fingerprint legitimately streamable — ANY
    arrival order over any batch split folds to the same value, so
    batch == streaming equality is exact, not order-lucky (pinned in
    tests/test_streaming.py).

    Scale: state is |sources| rows of three longs; per-batch work is
    one map-side-combined partial aggregate — the cheapest possible
    continuous dataset-version tripwire over an ingest stream."""
    # the ONE fingerprint definition, shared with the batch q224
    from file_appender_spark.queries.tranche10 import fingerprint_agg

    return fingerprint_agg(docs)
