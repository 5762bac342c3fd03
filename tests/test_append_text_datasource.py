"""The Spark-4 Python DataSource wrapping of the append-text layout:
format("append_text") must read back exactly what read_delimited
reads (same multiset, same null inverse mapping), with one input
partition per rotated file."""

from __future__ import annotations

import pytest

from file_appender_spark.config import AppendSinkConfig
from file_appender_spark.sinks.append_text import append_text
from file_appender_spark.sources.append_text_datasource import AppendTextDataSource
from file_appender_spark.sources.catalog import read_delimited

SCHEMA = "name string, qty int, price double, ok boolean"
ROWS = [
    ("alpha", 1, 1.5, True),
    ("beta", None, 2.25, False),
    ("gamma", 3, None, None),
    ("delta", 4, 0.0, True),
]


@pytest.fixture()
def written_dir(spark, tmp_path):
    out = str(tmp_path / "out")
    df = spark.createDataFrame(ROWS, SCHEMA)
    append_text(df, AppendSinkConfig(output_dir=out, file_prefix="f"), run_ts_ms=1000)
    return out


def _register(spark):
    # idempotent across the shared session fixture
    try:
        spark.dataSource.register(AppendTextDataSource)
    except Exception:
        pass


def test_datasource_matches_read_delimited(spark, written_dir):
    _register(spark)
    via_ds = (
        spark.read.format("append_text").schema(SCHEMA).load(written_dir).collect()
    )
    via_csv = read_delimited(spark, written_dir, SCHEMA).collect()
    assert sorted(map(tuple, via_ds)) == sorted(map(tuple, via_csv))
    # null inverse mapping: "" wrote for None, reads back as None
    got = {tuple(r) for r in via_ds}
    assert ("beta", None, 2.25, False) in got
    assert ("gamma", 3, None, None) in got


def test_datasource_is_sql_queryable(spark, written_dir):
    _register(spark)
    df = spark.read.format("append_text").schema(SCHEMA).load(written_dir)
    df.createOrReplaceTempView("appended_ds")
    n = spark.sql(
        "SELECT count(*) AS n FROM appended_ds WHERE qty IS NOT NULL"
    ).collect()[0]["n"]
    assert n == 3


def test_one_partition_per_rotated_file(spark, tmp_path):
    """Rotation leaves N files; the reader must expose N-way
    parallelism, mirroring the sink's one-writer-per-file protocol."""
    out = str(tmp_path / "rot")
    df = spark.createDataFrame(
        [(f"row{i:04d}" * 2000, i, float(i), True) for i in range(200)], SCHEMA
    ).coalesce(1)
    # ~16 KB rows x 200 = ~3.2 MB against a 1 MB threshold: several rotations
    append_text(
        df,
        AppendSinkConfig(output_dir=out, file_prefix="f", size_threshold_mb=1),
        run_ts_ms=1000,
    )
    _register(spark)
    reader = AppendTextDataSource(
        {"path": out, "ddl": SCHEMA}
    ).reader(spark.createDataFrame([], SCHEMA).schema)
    import os

    n_files = len(
        [f for f in os.listdir(out) if not f.startswith(("_", "."))]
    )
    assert len(reader.partitions()) == n_files >= 2  # rotation really split
    back = spark.read.format("append_text").schema(SCHEMA).load(out)
    assert back.count() == 200


def test_missing_schema_raises(spark, written_dir):
    _register(spark)
    with pytest.raises(Exception, match="schema"):
        spark.read.format("append_text").load(written_dir).count()


def test_streaming_tail_exactly_once_across_appends(spark, tmp_path):
    """The streaming half (the capability the reference's pom declares
    but its code never implements): run 1 consumes the initial
    appends, run 2 — same checkpoint — consumes ONLY the delta, and
    the downstream parquet table holds each row exactly once."""
    out = str(tmp_path / "tailed")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    cfg = AppendSinkConfig(output_dir=out, file_prefix="f")
    _register(spark)

    def run_stream():
        q = (
            spark.readStream.format("append_text")
            .schema(SCHEMA)
            .load(out)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    append_text(spark.createDataFrame(ROWS[:2], SCHEMA), cfg, run_ts_ms=1000)
    run_stream()
    got1 = {tuple(r) for r in spark.read.parquet(sink).collect()}
    assert got1 == {ROWS[0], ROWS[1]}

    append_text(spark.createDataFrame(ROWS[2:], SCHEMA), cfg, run_ts_ms=2000)
    run_stream()
    got2 = sorted(tuple(r) for r in spark.read.parquet(sink).collect())
    assert got2 == sorted(ROWS)  # no re-delivery of run-1 rows


def test_empty_and_empty_file_dirs_read_as_zero_rows(spark, tmp_path):
    """An empty directory (or one holding only 0-byte files, which
    rotation can leave behind) is a valid, zero-row table — not an
    error (the API still calls read() once; the sentinel partition
    must yield nothing)."""
    import os

    d = str(tmp_path / "empty")
    os.makedirs(d)
    _register(spark)
    assert spark.read.format("append_text").schema(SCHEMA).load(d).count() == 0
    open(os.path.join(d, "f-1000"), "w").close()
    assert spark.read.format("append_text").schema(SCHEMA).load(d).count() == 0
