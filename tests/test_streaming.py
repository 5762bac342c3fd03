"""Structured Streaming tests: file source -> memory sink, driven
synchronously with processAllAvailable (SURVEY.md §5 new-engine
strategy: streaming has no duckdb oracle — golden checks are computed
from the same data in batch mode instead)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from file_appender_spark.sources.catalog import load_table
from file_appender_spark.streaming.ops import (
    dedup_within_watermark,
    read_event_stream,
    running_totals_with_state,
    session_counts,
    stream_to_append_sink,
    windowed_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Events written to a plain-timestamp parquet dir (the raw driver
    file has ns timestamps a stream source can't use directly)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, sf_dir, "events").limit(2000)
    # repartition, not coalesce: limit() yields ONE partition and
    # coalesce cannot grow it — the dir must hold 2 files so
    # maxFilesPerTrigger=1 drives can force 2 micro-batches
    ev.repartition(2).write.mode("overwrite").parquet(d)
    return d


def run_stream(spark, df, name, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_counts_matches_batch(spark, events_dir):
    # complete mode: append-mode only emits watermark-finalized
    # windows, so a single availableNow batch would hold back the tail
    stream = read_event_stream(spark, events_dir)
    got = run_stream(
        spark, windowed_counts(stream, window="1 hour"), "win_counts", mode="complete"
    )
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type", "n", "total_value",
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_sliding_window_runs(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    got = run_stream(
        spark,
        windowed_counts(stream, window="1 hour", slide="30 minutes"),
        "slide_counts",
        mode="complete",
    )
    rows = got.collect()
    assert len(rows) > 0
    # every event lands in exactly 2 sliding windows -> total n doubles
    n_events = spark.read.parquet(events_dir).count()
    assert sum(r["n"] for r in rows) == 2 * n_events


def test_session_counts_matches_batch_sessionize(spark, events_dir):
    from file_appender_spark.operators.sessionize import sessionize

    stream = read_event_stream(spark, events_dir)
    got = run_stream(
        spark, session_counts(stream, gap="30 minutes"), "sess_counts", mode="complete"
    )
    ev = spark.read.parquet(events_dir)
    batch = (
        sessionize(ev, key="user_id", ts="ts", gap_seconds=1800, order_tiebreak="event_id")
        .groupBy("user_id", "session_idx")
        .agg(F.count("*").alias("n_events"))
    )
    got_sets = sorted((r["user_id"], r["n_events"]) for r in got.collect())
    batch_sets = sorted((r["user_id"], r["n_events"]) for r in batch.collect())
    assert got_sets == batch_sets


def test_streaming_dedup(spark, events_dir, tmp_path):
    # duplicate the input dir -> every event appears twice
    dup_dir = str(tmp_path / "dup")
    ev = spark.read.parquet(events_dir)
    ev.union(ev).coalesce(2).write.mode("overwrite").parquet(dup_dir)
    stream = read_event_stream(spark, dup_dir)
    got = run_stream(spark, dedup_within_watermark(stream, ["event_id"]), "dedup_s")
    assert got.count() == ev.count()


def test_running_totals_with_state(spark, events_dir):
    # maxFilesPerTrigger=1 over the 2-file dir forces TWO micro-batches
    # so the state.exists branch actually runs (GroupState.get is a
    # property — calling it only failed on the SECOND batch, which a
    # single-batch drive never reached)
    from file_appender_spark.streaming.ops import EVENT_SCHEMA

    stream = (
        spark.readStream.format("parquet")
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(events_dir)
    )
    q = (
        running_totals_with_state(stream)
        .writeStream.format("memory")
        .queryName("run_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    q.stop()
    assert n_batches >= 2, "two-file source must produce >= 2 micro-batches"
    got = spark.sql("SELECT * FROM run_totals")
    ev = spark.read.parquet(events_dir)
    batch = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2).alias("total_value"),
    )
    # memory sink in update mode keeps every update; the row with the
    # highest n_events per user is the final state
    final = {}
    for r in got.collect():
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["total_value"])
    expected = {
        r["user_id"]: (r["n_events"], r["total_value"]) for r in batch.collect()
    }
    assert final == expected


def test_watermark_drops_late_data(spark, tmp_path):
    """Two micro-batches: batch 1 sets the watermark far past batch
    2's event times -> the late rows are dropped from the aggregation
    (update mode; append would also drop them)."""
    from pyspark.sql import Row
    import datetime as dt

    d = str(tmp_path / "late_src")
    os.makedirs(d)

    def ev(eid, hour, minute=0):
        return Row(
            event_id=eid,
            ts=dt.datetime(2020, 1, 1, hour, minute),
            user_id=1,
            event_type="click",
            value=1.0,
            props="{}",
        )

    # batch 1: events at hour 10 -> watermark ~ 09:30 (10:00 - 30min)
    spark.createDataFrame([ev(1, 10), ev(2, 10, 30)]).coalesce(1).write.parquet(
        d + "/b1"
    )
    stream = read_event_stream(spark, d + "/b1")
    agg = windowed_counts(stream, window="1 hour", watermark="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_drop")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()  # batch 1 processed; watermark now ~09:30
    # batch 2 into the same live query: an event at hour 1 — far
    # below the established watermark -> must be dropped
    spark.createDataFrame([ev(3, 1)]).coalesce(1).write.mode("append").parquet(
        d + "/b1"
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM late_drop").collect()
    assert any(r["window_start"].hour == 10 for r in rows), rows
    assert all(r["window_start"].hour != 1 for r in rows), rows


def test_stream_stream_interval_join_matches_batch(spark, events_dir):
    from file_appender_spark.streaming.ops import interval_join_streams

    clicks_s = read_event_stream(spark, events_dir).filter(
        F.col("event_type") == "click"
    )
    buys_s = read_event_stream(spark, events_dir).filter(
        F.col("event_type") == "purchase"
    )
    joined = interval_join_streams(
        clicks_s, buys_s, upper="30 minutes", watermark="1 hour"
    )
    got = run_stream(spark, joined, "ssj")
    ev = spark.read.parquet(events_dir)
    c = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("l_key"), F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_id"),
    )
    b = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("r_key"), F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_id"),
    )
    batch = c.join(
        b,
        (c.l_key == b.r_key)
        & (b.r_ts >= c.l_ts)
        & (b.r_ts <= c.l_ts + F.expr("INTERVAL 30 minutes")),
    )
    got_pairs = sorted((r["l_id"], r["r_id"]) for r in got.collect())
    batch_pairs = sorted((r["l_id"], r["r_id"]) for r in batch.collect())
    assert got_pairs == batch_pairs
    assert len(got_pairs) > 0


def test_session_window_merges_exact_gap_events(spark):
    """Pin the empirically-verified boundary semantics the q39 oracle
    encodes: two events EXACTLY gap apart merge into ONE session."""
    import datetime as dt

    df = spark.createDataFrame(
        [(1, dt.datetime(2020, 1, 1, 0, 0, 0)),
         (1, dt.datetime(2020, 1, 1, 0, 30, 0))],  # exactly 1800s later
        "user_id long, ts timestamp",
    )
    out = (
        df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
        .collect()
    )
    assert len(out) == 1 and out[0]["count"] == 2


def test_foreach_batch_drives_append_sink(spark, events_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = read_event_stream(spark, events_dir).select(
        "event_id", "event_type", "value"
    )
    q = stream_to_append_sink(stream, out, ckpt)
    q.processAllAvailable()
    q.stop()
    files = [f for f in os.listdir(out) if f.startswith("stream-")]
    assert files, "append sink produced no files"
    n_lines = 0
    for f in files:
        with open(os.path.join(out, f), "rb") as fh:
            n_lines += len(fh.read().decode("utf-8").splitlines())
    assert n_lines == spark.read.parquet(events_dir).count()


def test_transform_with_state_running_totals(spark, events_dir):
    """Spark-4 stateful API twin of the applyInPandasWithState op:
    after all micro-batches, the latest per-user emission equals the
    batch aggregate."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithStateInPandas requires protobuf at runtime",
    )
    from file_appender_spark.streaming.ops import running_totals_tws

    stream = read_event_stream(spark, events_dir)
    got = run_stream(
        spark, running_totals_tws(stream), "tws_totals", mode="update"
    )
    # update mode re-emits a key per batch: keep the LAST emission
    # (max n_events — counts only grow)
    latest = (
        got.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
        )
    )
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    assert sorted(map(tuple, latest.collect())) == sorted(map(tuple, batch.collect()))


def test_progress_collector_captures_metrics(spark, events_dir):
    from file_appender_spark.streaming.monitor import ProgressCollector

    collector = ProgressCollector().attach(spark)
    try:
        stream = read_event_stream(spark, events_dir)
        got = run_stream(
            spark,
            windowed_counts(stream, window="1 hour"),
            "monitored_counts",
            mode="complete",
        )
        assert got.count() > 0
        # the listener bus is async: wait until the row total stops
        # growing (bounded), then assert on the drained snapshot
        import time

        prev = -1
        for _ in range(20):
            rows = collector.totals()["rows"]
            if rows == prev and rows > 0:
                break
            prev = rows
            time.sleep(0.5)
        records = collector.snapshot()
        assert records, "no progress events captured"
        mine = [r for r in records if r["query_name"] == "monitored_counts"]
        assert mine
        totals = collector.totals()
        assert totals["rows"] > 0
        assert totals["batches"] >= 1
        assert totals["max_batch_ms"] is not None
    finally:
        collector.detach(spark)


def test_clamped_balance_stream_equals_batch_q202(spark, sf_dir, tmp_path):
    """The streaming clamp state machine must reproduce q202's batch
    answer exactly when events arrive in time order across
    micro-batches (time-split files + maxFilesPerTrigger=1 force the
    state to genuinely carry balances between batches)."""
    from pyspark.sql import functions as F

    from file_appender_spark.queries import QUERIES
    from file_appender_spark.streaming.ops import (
        EVENT_SCHEMA,
        clamped_balance_with_state,
    )

    ev = load_table(spark, sf_dir, "events")
    # any time split works (midpoint of the range): the point is two
    # time-ordered batches, not an exact median
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    d = str(tmp_path / "ev_timesplit")
    # two time-ordered files -> two micro-batches, second depends on
    # first's carried state
    ev.filter(F.col("ts") <= F.lit(mid)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d + "/p1")
    ev.filter(F.col("ts") > F.lit(mid)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d + "/p2")
    import glob
    import shutil

    flat = str(tmp_path / "ev_flat")
    os.makedirs(flat, exist_ok=True)
    # 0-prefixed names keep listing order == time order
    for i, part in enumerate(
        sorted(glob.glob(d + "/p1/part-*.parquet"))
        + sorted(glob.glob(d + "/p2/part-*.parquet"))
    ):
        shutil.copy(part, os.path.join(flat, f"{i:02d}.parquet"))

    stream = (
        spark.readStream.format("parquet")
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(flat)
    )
    q = (
        clamped_balance_with_state(stream)
        .writeStream.format("memory")
        .queryName("clamp_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["user_id"], r["event_id"]): r["balance_cents"]
        for r in spark.sql("SELECT * FROM clamp_stream").collect()
    }
    want = {
        (r["user_id"], r["event_id"]): r["balance_cents"]
        for r in QUERIES["q202_clamped_balance"].spark_fn(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) == ev.count()


def test_corpus_fingerprint_stream_equals_batch_q224(spark, sf_dir, tmp_path):
    """The streaming per-source fingerprint must equal q224's batch
    answer after consuming the corpus in two micro-batches — XOR's
    commutativity makes the equality exact for ANY split, so the
    split here is arbitrary (doc_id parity)."""
    from pyspark.sql import functions as F

    from file_appender_spark.queries import QUERIES
    from file_appender_spark.streaming.ops import (
        DOC_SCHEMA,
        corpus_fingerprint_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    d = str(tmp_path / "docs_stream")
    os.makedirs(d, exist_ok=True)
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d + "_a")
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d + "_b")
    import glob
    import shutil

    for i, part in enumerate(
        sorted(glob.glob(d + "_a/part-*.parquet"))
        + sorted(glob.glob(d + "_b/part-*.parquet"))
    ):
        shutil.copy(part, os.path.join(d, f"{i:02d}.parquet"))

    stream = (
        spark.readStream.format("parquet")
        .schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(d)
    )
    q = (
        corpus_fingerprint_stream(stream)
        .writeStream.format("memory")
        .queryName("fp_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["source"]: (r["n_docs"], r["n_chars_total"], r["fingerprint"])
        for r in spark.table("fp_stream").collect()
    }
    want = {
        r["source"]: (r["n_docs"], r["n_chars_total"], r["fingerprint"])
        for r in QUERIES["q224_corpus_fingerprint"].spark_fn(spark, sf_dir).collect()
    }
    assert got == want
