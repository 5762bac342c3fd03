"""End-to-end curation funnel (file_appender_spark/curate.py): funnel
monotonicity, rerun determinism, written-shard integrity, and the CLI
face."""

from __future__ import annotations

import json

from file_appender_spark.curate import curate
from file_appender_spark.sources.catalog import load_table


def test_curate_funnel_and_shards(spark, sf_dir, tmp_path):
    out = str(tmp_path / "shards")
    docs = load_table(spark, sf_dir, "documents")
    r = curate(spark, docs, out)
    # funnel only ever narrows, and every stage actually ran
    assert (
        r["input"]
        >= r["after_exact_dedup"]
        >= r["after_near_dedup"]
        >= r["after_quality"]
        == r["written"]
    )
    assert r["written"] > 0
    # all three splits materialized and partition column round-trips
    assert set(r["by_split"]) == {"train", "val", "test"}
    assert sum(r["by_split"].values()) == r["written"]
    # the 80/10/10 hash split is roughly honored (hash noise allowed)
    assert r["by_split"]["train"] > r["by_split"]["val"]
    assert r["by_split"]["train"] > r["by_split"]["test"]
    # PII scrub applied to the written text
    import pyspark.sql.functions as F

    written = spark.read.parquet(out)
    assert written.filter(F.col("text").rlike("[0-9]")).count() == 0


def test_curate_is_rerun_stable(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    r1 = curate(spark, docs, str(tmp_path / "a"))
    r2 = curate(spark, docs, str(tmp_path / "b"))
    assert r1 == r2
    a = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "a")).select(
            "doc_id", "split"
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "b")).select(
            "doc_id", "split"
        ).collect()
    )
    assert a == b


def test_curate_cli(spark, sf_dir, tmp_path, capsys):
    from file_appender_spark.__main__ import main

    out = str(tmp_path / "cli_shards")
    rc = main(["--sf-dir", sf_dir, "--curate", out])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["written"] > 0 and set(report["by_split"]) == {
        "train",
        "val",
        "test",
    }


def test_curate_typed_pii_mode(spark, tmp_path):
    """pii_mode='typed' applies the free-text class-token scrub: a
    planted email survives as [EMAIL]; unknown modes are rejected."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (i, f"word salad number {i} reach me at user{i}@mail.example today")
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    r = curate(spark, docs, str(tmp_path / "typed"), pii_mode="typed")
    assert r["written"] > 0
    written = spark.read.parquet(str(tmp_path / "typed"))
    assert written.filter(F.col("text").contains("[EMAIL]")).count() == r["written"]
    assert written.filter(F.col("text").contains("@")).count() == 0
    with _pytest.raises(ValueError, match="pii_mode"):
        curate(spark, docs, str(tmp_path / "bad"), pii_mode="nope")
