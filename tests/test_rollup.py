"""Continuous rollup: the incrementally-maintained aggregate table
must equal the from-scratch batch aggregation, with updates arriving
across multiple micro-batches, and the merge must be idempotent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from file_appender_spark.sources.catalog import load_table
from file_appender_spark.streaming.rollup import (
    continuous_rollup,
    merge_rollup_batch,
    rollup_aggregate,
)
from file_appender_spark.streaming.ops import read_event_stream


@pytest.fixture(scope="module")
def chunked_events_dir(spark, sf_dir, tmp_path_factory):
    """Events split into 3 files in ts order, so a maxFilesPerTrigger=1
    stream sees them as 3 micro-batches updating overlapping windows
    (chunk boundaries don't align to window boundaries)."""
    d = str(tmp_path_factory.mktemp("events_chunks"))
    ev = load_table(spark, sf_dir, "events").limit(3000).orderBy("ts", "event_id")
    n = ev.count()
    rows = ev.collect()
    for i, lo in enumerate(range(0, n, n // 3 + 1)):
        chunk = spark.createDataFrame(rows[lo : lo + n // 3 + 1], ev.schema)
        chunk.coalesce(1).write.mode("overwrite").parquet(f"{d}/../chunk{i}")
        import glob
        import shutil

        src = glob.glob(f"{d}/../chunk{i}/part-*.parquet")[0]
        shutil.copy(src, f"{d}/chunk{i:02d}.parquet")
    return d


def _batch_truth(spark, src_dir):
    return (
        spark.read.parquet(src_dir)
        .groupBy(F.window("ts", "1 hour"), "event_type")
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


def _canon(df):
    return sorted(
        (str(r.window_start), str(r.window_end), r.event_type, r.n_events, r.total_value)
        for r in df.collect()
    )


def test_rollup_table_equals_batch_recompute(spark, chunked_events_dir, tmp_path):
    rollup_dir = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.format("parquet").schema(
        spark.read.parquet(chunked_events_dir).schema
    ).option("maxFilesPerTrigger", 1).load(chunked_events_dir)
    q = continuous_rollup(
        stream, rollup_dir, ckpt, window="1 hour", watermark="1 day"
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(rollup_dir).drop("window_date")
    want = _batch_truth(spark, chunked_events_dir)
    assert _canon(got) == _canon(want)
    # partitioned by window date (the partition-pruning axis)
    import os

    assert any(p.startswith("window_date=") for p in os.listdir(rollup_dir))


def test_merge_is_idempotent_and_partition_scoped(spark, sf_dir, tmp_path):
    rollup_dir = str(tmp_path / "rollup2")
    ev = load_table(spark, sf_dir, "events").limit(2000)
    full = rollup_aggregate(ev, "1 hour", "1 day")
    merge_rollup_batch(spark, full, rollup_dir)
    once = _canon(spark.read.parquet(rollup_dir).drop("window_date"))
    # replaying the same updates must not change the table
    merge_rollup_batch(spark, full, rollup_dir)
    twice = _canon(spark.read.parquet(rollup_dir).drop("window_date"))
    assert once == twice
    # an update touching one window replaces that key only; pin the
    # row as a literal first (a lazy limit(1) over the target table
    # would re-read it mid-overwrite and pick a different row)
    table = spark.read.parquet(rollup_dir).drop("window_date")
    base = table.orderBy("window_start", "event_type").limit(1).collect()[0]
    bumped = spark.createDataFrame(
        [(base.window_start, base.window_end, base.event_type,
          base.n_events + 100, base.total_value)],
        table.schema,
    )
    merge_rollup_batch(spark, bumped, rollup_dir)
    after = spark.read.parquet(rollup_dir).drop("window_date")
    assert after.count() == len(once)
    got_row = after.filter(
        (F.col("window_start") == base.window_start)
        & (F.col("event_type") == base.event_type)
    ).collect()[0]
    assert got_row.n_events == base.n_events + 100


def test_rollup_resumes_from_checkpoint(spark, chunked_events_dir, tmp_path):
    """Stop the maintenance stream, let new data arrive, restart with
    the SAME checkpoint: the rollup must continue incrementally (no
    reprocessing from zero) and converge to the batch truth."""
    import glob
    import shutil

    src = str(tmp_path / "src")
    import os

    os.makedirs(src)
    chunks = sorted(glob.glob(chunked_events_dir + "/*.parquet"))
    shutil.copy(chunks[0], src + "/c0.parquet")
    shutil.copy(chunks[1], src + "/c1.parquet")
    rollup_dir, ckpt = str(tmp_path / "rollup"), str(tmp_path / "ckpt")
    schema = spark.read.parquet(chunked_events_dir).schema

    def start():
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(src)
        )
        return continuous_rollup(
            stream, rollup_dir, ckpt, window="1 hour", watermark="1 day"
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    partial = spark.read.parquet(rollup_dir)
    n_partial = partial.count()
    assert n_partial > 0
    # new data lands while the job is down
    shutil.copy(chunks[2], src + "/c2.parquet")
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    got = spark.read.parquet(rollup_dir).drop("window_date")
    want = _batch_truth(spark, src)
    assert _canon(got) == _canon(want)


def test_rollup_maintained_from_append_text_stream(spark, tmp_path):
    """Full-circle integration: records written by the REFERENCE's
    append-with-rotation sink stream straight into the continuously
    maintained rollup table via format("append_text") — sink output
    as a live source, with the rollup equal to a batch recompute
    after every increment."""
    import datetime

    from file_appender_spark.config import AppendSinkConfig
    from file_appender_spark.sinks.append_text import append_text
    from file_appender_spark.sources.append_text_datasource import (
        AppendTextDataSource,
    )
    from file_appender_spark.sources.catalog import read_delimited

    out = str(tmp_path / "appended")
    rollup_dir = str(tmp_path / "rollup3")
    ckpt = str(tmp_path / "ckpt3")
    schema = "ts timestamp, event_type string, value double"
    cfg = AppendSinkConfig(output_dir=out, file_prefix="ev")
    try:
        spark.dataSource.register(AppendTextDataSource)
    except Exception:
        pass

    def batch(hours, etype, n):
        t0 = datetime.datetime(2024, 3, 1)
        return spark.createDataFrame(
            [
                (t0 + datetime.timedelta(hours=h, minutes=7 * i), etype, float(i))
                for h in hours
                for i in range(n)
            ],
            schema,
        )

    append_text(batch([0, 1], "click", 5), cfg, run_ts_ms=1000)
    stream = spark.readStream.format("append_text").schema(schema).load(out)
    q = continuous_rollup(stream, rollup_dir, ckpt, window="1 hour", watermark="1 day")
    try:
        q.processAllAvailable()
        truth1 = rollup_aggregate(
            read_delimited(spark, out, schema), "1 hour", "1 day"
        )
        assert _canon(spark.read.parquet(rollup_dir).drop("window_date")) == _canon(
            truth1
        )
        # second sink run APPENDS into the same files; the stream picks
        # up only the delta and the rollup stays equal to a recompute
        append_text(batch([1, 2], "purchase", 4), cfg, run_ts_ms=2000)
        q.processAllAvailable()
        truth2 = rollup_aggregate(
            read_delimited(spark, out, schema), "1 hour", "1 day"
        )
        assert _canon(spark.read.parquet(rollup_dir).drop("window_date")) == _canon(
            truth2
        )
    finally:
        q.stop()
