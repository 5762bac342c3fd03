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


def test_incremental_streaming_curate_equals_batch(spark, tmp_path):
    """VERDICT r3 stretch: drive the curation pipeline INCREMENTALLY
    through a real micro-batch stream (foreachBatch -> exact-hash
    store -> textdup near-dup ingest -> quality/PII/split -> shard
    append) and prove the curated output equals one-shot batch
    curate() over the same corpus.

    Stage expressions are imported from curate.py itself
    (quality_alpha_ratio / scrub_expr / split_col), so batch and
    incremental literally share the stage code; dedup state lives in
    the same persistent stores the ingest operators maintain.

    Corpus design keeps both near-dup verifiers in their agreement
    regime (curate verifies EXACT shingle Jaccard, the ingest store
    verifies the 16-slot ESTIMATE): duplicates are exact copies or
    one-word-appended near-copies (jaccard ~0.875), non-dups share
    nothing — no borderline pairs. Batches arrive in doc_id order so
    first-arrival-wins (incremental) equals min-id-keep (batch)."""
    import os
    import time

    import pyspark.sql.functions as F
    from pyspark.sql.window import Window as W

    from file_appender_spark.curate import (
        quality_alpha_ratio,
        scrub_expr,
        split_col,
    )
    from file_appender_spark.operators.neardup_ingest import textdup_ingest_batch

    base = (
        "the quick brown fox jumps over lazy dogs daily while watching "
        "birds migrate across the valley"
    )
    other = (
        "completely different prose about glacier formation and mineral "
        "deposits in alpine regions over geological time"
    )
    third = (
        "a third unrelated passage describing harbor logistics container "
        "cranes and tide schedules for coastal shipping"
    )
    b1_rows = [
        (1, base),
        (2, other),
        (3, base),  # exact dup of 1 (within-batch)
        (4, "1234 5678 9012 !!!! 0000 9999 8888"),  # fails quality gate
    ]
    b2_rows = [
        (11, base),  # exact dup of 1 (cross-batch)
        (12, base + " suddenly"),  # near-dup of 1 (cross-batch)
        (13, third),
        (14, third + " postscript"),  # near-dup of 13 (within-batch)
    ]
    schema = "doc_id long, text string"
    all_docs = spark.createDataFrame(b1_rows + b2_rows, schema)

    # ---- one-shot batch reference ------------------------------------
    from file_appender_spark.curate import curate

    batch_out = str(tmp_path / "batch_shards")
    curate(spark, all_docs, batch_out, near_threshold=0.5)

    # ---- incremental drive through a real stream ---------------------
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(b1_rows, schema).coalesce(1).write.parquet(
        str(src / "b1")
    )
    time.sleep(1.1)  # file-source ordering is mtime-based
    spark.createDataFrame(b2_rows, schema).coalesce(1).write.parquet(
        str(src / "b2")
    )
    hash_store = str(tmp_path / "hash_store")
    sig_store = str(tmp_path / "sig_store")
    stats_store = str(tmp_path / "stats_store")
    inc_out = str(tmp_path / "inc_shards")

    from file_appender_spark.operators.corpusstats import corpusstats_ingest_batch

    def handle(batch_df, batch_id):
        # stage 0: corpus-stats maintenance rides the same micro-batch
        # (the operators/corpusstats.py epoch-partition protocol) —
        # one stream maintains dedup state AND the token-marginal
        # store the q58/q197/q212/q231 stats_dir paths consume
        corpusstats_ingest_batch(
            spark,
            batch_df.withColumn("source", F.lit("stream")),
            stats_store,
            batch_id,
        )
        # stage 1: exact dedup — min-id keep within batch, then
        # first-arrival-wins vs the persistent hash store
        hashed = batch_df.withColumn("_h", F.sha2("text", 256))
        keep = (
            hashed.withColumn("_m", F.min("doc_id").over(W.partitionBy("_h")))
            .filter(F.col("doc_id") == F.col("_m"))
            .drop("_m")
        )
        if os.path.exists(hash_store):
            keep = keep.join(
                spark.read.parquet(hash_store), "_h", "left_anti"
            )
        keep = keep.localCheckpoint(eager=True)
        keep.select("_h").write.mode("append").parquet(hash_store)
        d1 = keep.drop("_h")
        # stage 2: near-dup suppression vs the persistent MinHash store
        admitted = textdup_ingest_batch(spark, d1, sig_store, threshold=0.5)
        # stages 3-5: the SAME expressions batch curate() uses
        out = (
            admitted.filter(quality_alpha_ratio() >= 0.45)
            .withColumn("text", scrub_expr("digits"))
            .withColumn("split", split_col())
        )
        out.write.mode("append").partitionBy("split").parquet(inc_out)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = stream.writeStream.foreachBatch(handle).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["doc_id"], r["text"], r["split"])
        for r in spark.read.parquet(inc_out).collect()
    }
    want = {
        (r["doc_id"], r["text"], r["split"])
        for r in spark.read.parquet(batch_out).collect()
    }
    assert got == want
    # the funnel genuinely suppressed things: survivors are exactly
    # the first copy of each text family that also passed quality
    assert {d for d, _, _ in want} == {1, 2, 13}
    # the stats store maintained alongside equals the one-shot build
    # over the SAME corpus (pre-dedup: stats see every arriving doc)
    from file_appender_spark.operators.corpusstats import (
        corpus_token_stats,
        read_token_stats,
    )

    want_stats = sorted(
        tuple(r)
        for r in corpus_token_stats(
            all_docs.withColumn("source", F.lit("stream"))
        ).collect()
    )
    got_stats = sorted(
        tuple(r) for r in read_token_stats(spark, stats_store).collect()
    )
    assert got_stats == want_stats


def test_curate_model_quality_gate_matches_q154_decision(spark, sf_dir, tmp_path):
    """quality_mode='model' must keep exactly the stage-2 survivors
    whose q154 keep flag is 1 — the gate and the query share one
    expression, so the sets cannot drift."""
    from file_appender_spark.curate import curate
    from file_appender_spark.queries import QUERIES
    from file_appender_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "curated_model")
    funnel = curate(spark, docs, out, quality_mode="model")
    assert funnel["after_quality"] <= funnel["after_near_dedup"]

    written = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    q154 = QUERIES["q154_quality_classifier"].spark_fn(spark, sf_dir)
    keep_ids = {r["doc_id"] for r in q154.filter("keep = 1").collect()}
    # written ids passed dedup THEN the model gate: every written id
    # must be model-kept; and no model-dropped id may appear
    assert written <= keep_ids
    assert funnel["written"] == funnel["after_quality"]
    # the REVERSE direction (r4 advisory): the gate must not drop
    # model-kept survivors either. Recover the stage-2 survivor set by
    # rerunning the same deterministic dedup stages with the quality
    # gate neutralized (alpha threshold 0 keeps every row), then pin
    # written == stage-2 survivors INTERSECT model-kept — set equality,
    # not just the subset direction.
    out2 = str(tmp_path / "curated_nogate")
    curate(spark, docs, out2, quality_mode="alpha", min_alpha_ratio=0.0)
    stage2 = {r["doc_id"] for r in spark.read.parquet(out2).collect()}
    assert written == stage2 & keep_ids


def test_curate_gopher_quality_gate_planted_decisions(spark, sf_dir, tmp_path):
    """quality_mode='gopher' applies the published A1.1 rules; the
    expectations here are HAND-COMPUTED per rule (not re-derived from
    the shared expressions), so a drift in either the gate or
    _gopher_parts breaks the pin. The driver corpus itself contains
    only ONE distinct listed stop word ('the'), so the faithful
    two-DISTINCT-stops rule rejects all of it — also pinned."""
    from file_appender_spark.curate import curate
    from file_appender_spark.queries import QUERIES
    from file_appender_spark.sources.catalog import load_table

    rows = [
        # 60 words alternating two DISTINCT stop words: every rule
        # passes (mean word len exactly 3 hits the >= 3 bound)
        (1, "the and " * 30),
        # 60 words, zero stop words -> flag_stop fails
        (2, "zz1 zz2 " * 30),
        # 30 words with stops -> word count fails
        (3, "the and " * 15),
        # 60 words, <80% alphabetic words -> flag_alpha fails
        (4, "the and " + "123 456 " * 29),
    ]
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string"
    )
    out = str(tmp_path / "curated_gopher")
    funnel = curate(spark, docs, out, quality_mode="gopher")
    written = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert written == {1}
    assert funnel["after_quality"] == 1 == funnel["written"]

    # driver corpus: one distinct stop word only -> zero admissions,
    # and q192 agrees (its gopher_pass column is all 0)
    q192 = QUERIES["q192_gopher_rules"].spark_fn(spark, sf_dir)
    assert q192.filter("gopher_pass = 1").count() == 0
    sf_docs = load_table(spark, sf_dir, "documents")
    funnel2 = curate(
        spark, sf_docs, str(tmp_path / "curated_gopher_sf"), quality_mode="gopher"
    )
    assert funnel2["after_quality"] == 0 == funnel2["written"]


def test_curate_quality_mode_validation(spark, sf_dir):
    import pytest as _pytest

    from file_appender_spark.curate import quality_keep

    with _pytest.raises(ValueError):
        quality_keep("nope", 0.5)


def test_curate_image_dhash_mode_and_hot_image_prededup(spark, tmp_path):
    """image_mode='dhash' drops the same-payload-different-caption
    record; a HOT image (one payload under many captions) is handled
    through the exact-payload pre-dedup (ADVICE r5) with unchanged
    semantics: survivors = min of each payload group whose group rep
    is not the larger side of a near-dup pair."""
    from file_appender_spark.curate import curate

    hot = bytes((i * 37 + 11) % 256 for i in range(600))
    other = bytes((i * 101 + 5) % 256 for i in range(600))
    rows = [
        (10, "caption alpha wholly unlike the others", hot),
        (11, "caption beta describing the same image", hot),
        (12, "caption gamma a third distinct caption", hot),
        (13, "caption delta for the hot image again!", hot),
        (20, "a record about an unrelated second image", other),
        (30, "no payload on this record whatsoever ok", None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, payload binary")
    for mode in ("ahash", "dhash"):
        res = curate(
            spark,
            docs,
            str(tmp_path / f"cur_{mode}"),
            near_threshold=0.99,
            min_alpha_ratio=0.0,
            image_mode=mode,
        )
        ids = {
            r["doc_id"]
            for r in spark.read.parquet(str(tmp_path / f"cur_{mode}")).collect()
        }
        assert ids == {10, 20, 30}, (mode, ids)
        assert res["after_image_dedup"] == 3

    # the band_bucket_cap plumbs through (a generous cap changes nothing)
    res2 = curate(
        spark,
        docs,
        str(tmp_path / "cur_cap"),
        near_threshold=0.99,
        min_alpha_ratio=0.0,
        image_mode="ahash",
        image_band_bucket_cap=1000,
    )
    assert res2["after_image_dedup"] == 3


def test_curate_auto_band_bucket_cap_on_hot_neardup_family(spark, tmp_path):
    """r6 verdict task 7: the hot-bucket guard now DEFAULTS to the
    sized policy (band_bucket_cap_for) instead of None. The regime it
    exists for: a family of DISTINCT near-duplicate payloads (flat
    images of different lengths — every aHash band all-zero, hamming
    0) that exact-payload pre-dedup can NOT collapse. 80 members >
    the policy cap (65 at this corpus size), so under the default the
    degenerate bucket is dropped — bounded work, docs kept — while an
    explicit None pairs all of them and collapses the family."""
    from file_appender_spark.curate import curate

    rows = [
        (i, f"distinct caption number {i} for a flat image", bytes([7]) * (600 + i))
        for i in range(80)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, payload binary")
    res_auto = curate(
        spark,
        docs,
        str(tmp_path / "cur_auto_cap"),
        near_threshold=0.99,
        min_alpha_ratio=0.0,
        image_mode="ahash",
    )
    # default cap binds: the all-zero buckets are dropped, no pair
    # survives, every distinct payload is kept
    assert res_auto["after_image_dedup"] == 80
    res_none = curate(
        spark,
        docs,
        str(tmp_path / "cur_none_cap"),
        near_threshold=0.99,
        min_alpha_ratio=0.0,
        image_mode="ahash",
        image_band_bucket_cap=None,
    )
    # uncapped: the family pairs quadratically and collapses to min id
    assert res_none["after_image_dedup"] == 1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="image_band_bucket_cap"):
        curate(
            spark,
            docs,
            str(tmp_path / "cur_bad_cap"),
            image_mode="ahash",
            image_band_bucket_cap="nope",
        )


def test_curate_graph_dir_equals_recompute(spark, sf_dir, tmp_path):
    """r8 verdict task 5: batch curate with ``graph_dir`` (near-dup
    pairs served from a materialized pairstore) must reproduce the
    recompute funnel and shards EXACTLY — the store's full-corpus
    pair set restricted to surviving ids is the survivors' pair set.
    Also pins the threshold guard: a store built at a different
    threshold refuses."""
    import pytest
    from pyspark.sql import functions as F

    from file_appender_spark.operators.pairstore import build_pair_graph

    docs = load_table(spark, sf_dir, "documents")
    store = str(tmp_path / "graph")
    build_pair_graph(spark, docs, store)  # q52 threshold 0.2 = curate default

    r_plain = curate(spark, docs, str(tmp_path / "plain"))
    r_store = curate(spark, docs, str(tmp_path / "store"), graph_dir=store)
    assert r_store == r_plain
    a = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "plain"))
        .select("doc_id", "split", "text")
        .collect()
    )
    b = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "store"))
        .select("doc_id", "split", "text")
        .collect()
    )
    assert a == b
    assert r_store["after_near_dedup"] < r_store["after_exact_dedup"]

    with pytest.raises(ValueError, match="different graph"):
        curate(
            spark, docs, str(tmp_path / "refuse"),
            near_threshold=0.5, graph_dir=store,
        )
