"""Source/sink inventory tests (SURVEY.md §2 Part B scans/sources/
sinks): parquet sink roundtrip, partitioned sink with partition
pruning, json scan, the full A16 register-as-SQL-table flow, and the
salted-aggregation skew helper."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from file_appender_spark.operators.skew import salted_agg
from file_appender_spark.sources.catalog import (
    load_table,
    read_json,
    register_appended_table,
)


def test_parquet_sink_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "pq")
    src = load_table(spark, sf_dir, "orders")
    src.write.mode("overwrite").parquet(out)
    src.limit(0).write.mode("append").parquet(out)  # append mode works
    back = spark.read.parquet(out)
    assert back.count() == src.count()
    assert back.schema == src.schema


def test_partitioned_sink_prunes(spark, sf_dir, tmp_path):
    out = str(tmp_path / "part")
    src = load_table(spark, sf_dir, "orders")
    src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    statuses = [r[0] for r in src.select("o_orderstatus").distinct().collect()]
    assert any(n.startswith("o_orderstatus=") for n in os.listdir(out))
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == statuses[0])
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the filtered scan reads one partition dir
    assert back.count() == src.filter(F.col("o_orderstatus") == statuses[0]).count()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan


def test_max_records_per_file_controls_file_count(spark, sf_dir, tmp_path):
    out = str(tmp_path / "mrpf")
    src = load_table(spark, sf_dir, "nation")  # 25 rows
    src.coalesce(1).write.option("maxRecordsPerFile", 10).mode("overwrite").parquet(out)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 3  # 25 rows / 10 per file


def test_json_scan_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "json")
    src = load_table(spark, sf_dir, "events").limit(500)
    src.write.mode("overwrite").json(out)
    back = read_json(spark, out, src.schema)
    assert back.count() == 500
    back.createOrReplaceTempView("events_json")
    n = spark.sql(
        "SELECT count(*) n FROM events_json WHERE event_type = 'click'"
    ).collect()[0]["n"]
    assert n == src.filter("event_type = 'click'").count()


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orc")
    src = load_table(spark, sf_dir, "customer")
    src.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.count() == src.count()
    assert back.schema == src.schema


def test_hive_ddl_valid_for_all_driver_tables(spark, sf_dir):
    """A7 against reality: the generated Hive DDL for every driver
    table is accepted by Spark's CREATE TABLE parser."""
    from file_appender_spark.schema.hive import to_hive_schema
    from file_appender_spark.sources.catalog import TABLES

    for name in TABLES:
        schema = load_table(spark, sf_dir, name).schema
        ddl = to_hive_schema(schema)
        spark.sql(f"CREATE TABLE ddl_probe_{name} ({ddl}) USING parquet")
        spark.sql(f"DROP TABLE ddl_probe_{name}")


def test_register_appended_table_a16(spark, tmp_path):
    """Sink -> register -> SQL: the reference's Explore binding."""
    from file_appender_spark.config import AppendSinkConfig
    from file_appender_spark.sinks.append_text import append_text

    out = str(tmp_path / "a16")
    schema = T.StructType(
        [
            T.StructField("name", T.StringType(), True),
            T.StructField("n", T.LongType(), True),
        ]
    )
    df = spark.createDataFrame([("a", 1), ("b", None)], schema)
    append_text(df, AppendSinkConfig(output_dir=out, file_prefix="f"), run_ts_ms=1000)
    register_appended_table(spark, "appended_a16", out, schema)
    rows = {
        (r["name"], r["n"])
        for r in spark.sql("SELECT name, n FROM appended_a16").collect()
    }
    assert rows == {("a", 1), ("b", None)}
    spark.sql("DROP TABLE appended_a16")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Bucketing co-locates join keys at write time: a join of two
    tables bucketed on the join key runs with ZERO Exchange operators
    — the shuffle moved from query time to ingest time, which is the
    whole point at 100 TB (SURVEY.md §4 scale rules)."""
    from pyspark.sql import functions as F

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{tmp_path / 'wh'}'"
    )
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders")
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).saveAsTable("bucketdb.li_b")
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).saveAsTable("bucketdb.o_b")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("bucketdb.li_b").join(
                spark.table("bucketdb.o_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan
            assert j.count() == li.join(
                o, li.l_orderkey == o.o_orderkey
            ).count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    salted = salted_agg(
        li,
        ["l_returnflag"],
        partial_aggs=[F.sum("l_quantity").alias("s"), F.count("*").alias("c")],
        final_aggs=[
            F.round(F.sum("s"), 2).alias("sum_qty"),
            F.sum("c").alias("n"),
        ],
    )
    plain = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_parquet_schema_evolution_mergeschema(spark, sf_dir, tmp_path):
    """A table whose later files gained a column reads as the union
    schema with mergeSchema (nulls for old files) — the 100 TB lake
    reality where schemas drift across years of partitions."""
    d = str(tmp_path / "evolving")
    o = load_table(spark, sf_dir, "orders").limit(100)
    o.select("o_orderkey", "o_totalprice").write.parquet(d)
    o.select(
        "o_orderkey", "o_totalprice", F.lit("v2").alias("ingest_tag")
    ).write.mode("append").parquet(d)
    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(merged.columns) == {"o_orderkey", "o_totalprice", "ingest_tag"}
    assert merged.count() == 200
    assert merged.filter(F.col("ingest_tag").isNull()).count() == 100


def test_json_scan_permissive_corrupt_records(spark, tmp_path):
    """Malformed JSON lines land in the corrupt-record column instead
    of failing the job (PERMISSIVE is the only sane default when one
    bad record in a billion must not kill the pipeline)."""
    import os

    d = str(tmp_path / "json")
    os.makedirs(d)
    with open(os.path.join(d, "part-0.json"), "w") as f:
        f.write('{"a": 1, "b": "x"}\n')
        f.write("{not json at all\n")
        f.write('{"a": 3, "b": "z"}\n')
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(d)
    ).cache()  # SPARK-21610: corrupt-record column needs a materialized scan
    try:
        assert df.count() == 3
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert bad.count() == 1
        assert df.filter(F.col("a") == 3).count() == 1
    finally:
        df.unpersist()


def test_csv_permissive_and_dropmalformed(spark, tmp_path):
    """CSV rows with the wrong arity: PERMISSIVE nulls the missing
    fields, DROPMALFORMED skips the row — both without failing."""
    import os

    d = str(tmp_path / "csv")
    os.makedirs(d)
    with open(os.path.join(d, "part-0.csv"), "w") as f:
        f.write("1,alpha,10.5\n")
        f.write("2,beta\n")  # short row
        f.write("3,gamma,30.5\n")
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    permissive = spark.read.schema(schema).option("mode", "PERMISSIVE").csv(d)
    assert permissive.count() == 3
    assert permissive.filter(F.col("score").isNull()).count() == 1
    dropped = spark.read.schema(schema).option("mode", "DROPMALFORMED").csv(d)
    assert [r.id for r in dropped.orderBy("id").collect()] == [1, 3]


def test_tune_scan_splits_sizes_to_input(spark, sf_dir):
    """Split size derives from measured bytes: tiny inputs clamp to
    the 4 MB floor (max parallelism), lake-scale inputs stay at the
    128 MB default (the production value)."""
    from file_appender_spark.sources.catalog import tune_scan_splits

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        tune_scan_splits(spark, sf_dir)  # a few MB of driver data
        assert int(spark.conf.get("spark.sql.files.maxPartitionBytes")) == 4 * 1024 * 1024
        tune_scan_splits(spark, "/nonexistent")  # no files: untouched
        assert int(spark.conf.get("spark.sql.files.maxPartitionBytes")) == 4 * 1024 * 1024
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_tune_scan_splits_clamps_to_lake_default(spark, tmp_path):
    """At lake scale the formula lands back on the 128 MB production
    default (sparse file gives a multi-TB apparent size for free)."""
    from file_appender_spark.sources.catalog import tune_scan_splits

    big = tmp_path / "lineitem.parquet"
    with open(big, "wb") as f:
        f.truncate(2 * 1024**4)  # 2 TB apparent, 0 bytes on disk
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        tune_scan_splits(spark, str(tmp_path))
        assert (
            int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
            == 128 * 1024 * 1024
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_scan_exposes_file_lineage_metadata(spark, sf_dir, tmp_path):
    """Row-level lineage via the hidden `_metadata` struct: every row
    knows its source file and size — the audit/debug hook a 100 TB
    lake needs when a bad file must be traced and quarantined."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "lineage")
    load_table(spark, sf_dir, "orders").repartition(3).write.parquet(src)
    df = spark.read.parquet(src).select(
        "o_orderkey",
        F.col("_metadata.file_path").alias("file_path"),
        F.col("_metadata.file_size").alias("file_size"),
    )
    rows = df.limit(10).collect()
    assert rows and all(r.file_path.endswith(".parquet") for r in rows)
    # per-file row counts from lineage == the actual file layout
    per_file = df.groupBy("file_path").count().collect()
    assert len(per_file) == 3
    assert sum(r["count"] for r in per_file) == load_table(
        spark, sf_dir, "orders"
    ).count()


def test_binary_file_ingestion_to_multimodal_frame(spark, tmp_path):
    """binaryFile scan -> content-addressed multimodal frame: glob
    pruning, lazy per-task content reads, hash-stable doc ids."""
    from file_appender_spark.operators.multimodal import decode_features
    from file_appender_spark.sources.catalog import ingest_media_dir, read_binary_files

    payloads = {f"img_{i}.png": bytes([i]) * (10 + i) for i in range(3)}
    (tmp_path / "notes.txt").write_text("not media")
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)

    raw = read_binary_files(spark, str(tmp_path), glob="*.png")
    rows = raw.select("path", "length", "content").collect()
    assert len(rows) == 3  # txt pruned at listing time
    assert {os.path.basename(r["path"]): bytes(r["content"]) for r in rows} == payloads

    framed = ingest_media_dir(spark, str(tmp_path), "image/png", glob="*.png")
    out = framed.collect()
    assert len(out) == 3
    assert all(len(r["content_hash"]) == 64 for r in out)
    assert all(r["meta"]["mime"] == "image/png" for r in out)
    # identity is content-derived: re-ingesting yields identical ids
    again = {r["content_hash"]: r["doc_id"] for r in ingest_media_dir(
        spark, str(tmp_path), "image/png", glob="*.png").collect()}
    assert all(again[r["content_hash"]] == r["doc_id"] for r in out)
    # the frame feeds the decode stage unchanged (composition)
    assert decode_features(framed).count() == 3


def test_load_table_memo_invalidates_on_rewrite(spark, tmp_path):
    """The scan-plan memo is keyed on file mtime: rewriting a path
    must yield the NEW data/schema, never a stale cached plan
    (read-your-own-writes safety of the round-2 plan cache)."""
    import time as _time

    sf = str(tmp_path)
    p = os.path.join(sf, "orders.parquet")
    spark.range(3).selectExpr("id AS o_orderkey").write.parquet(p)
    first = load_table(spark, sf, "orders")
    assert first.count() == 3
    # same path, unchanged -> memoized object
    assert load_table(spark, sf, "orders") is first
    _time.sleep(0.01)  # ensure a distinct mtime_ns even on coarse clocks
    spark.range(5).selectExpr(
        "id AS o_orderkey", "id * 2 AS o_total"
    ).write.mode("overwrite").parquet(p)
    fresh = load_table(spark, sf, "orders")
    assert fresh is not first
    assert fresh.count() == 5
    assert set(fresh.columns) == {"o_orderkey", "o_total"}


def test_load_table_memo_invalidates_on_deep_partition_rewrite(spark, tmp_path):
    """A rewrite TWO partition levels deep (a=…/b=…/part.parquet) must
    bump the path version and invalidate the memo — _path_version
    walks the full tree, not just immediate children (a round-2
    advisory found the single-level stat missed exactly this)."""
    import time as _time

    sf = str(tmp_path)
    p = os.path.join(sf, "orders.parquet")
    spark.range(4).selectExpr(
        "id AS o_orderkey", "id % 2 AS a", "id % 2 AS b"
    ).write.partitionBy("a", "b").parquet(p)
    first = load_table(spark, sf, "orders")
    assert first.count() == 4
    assert load_table(spark, sf, "orders") is first
    _time.sleep(0.01)
    # overwrite ONE leaf partition in place: only files under
    # a=0/b=0 change; the table dir's own mtime stays put
    spark.range(10).selectExpr("id + 100 AS o_orderkey").write.mode(
        "overwrite"
    ).parquet(os.path.join(p, "a=0", "b=0"))
    fresh = load_table(spark, sf, "orders")
    assert fresh is not first, "deep rewrite must invalidate the memo"
    assert fresh.count() == 12  # 2 untouched rows + 10 rewritten
