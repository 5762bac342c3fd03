"""Invariant tests for the training-data curation tranche
(queries/pipeline.py) — properties the oracle hash-compare can't
express: the split is a partition of the corpus and survives
repartitioning, the bucket function matches an independent python
md5 implementation (a third engine, tie-breaking any Spark/DuckDB
shared misunderstanding), and chunking tiles documents exactly."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from file_appender_spark.queries import QUERIES
from file_appender_spark.queries.pipeline import (
    _CHUNK_LEN,
    _CHUNK_STRIDE,
    _bucket100,
)
from file_appender_spark.sources.catalog import load_table


def test_hash_split_is_a_partition_of_the_corpus(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    rows = QUERIES["q67_hash_split"].spark_fn(spark, sf_dir).collect()
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    assert sum(r["n_docs"] for r in rows) == d.count()
    per_lang = {}
    for r in rows:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + r["n_docs"]
    want = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per_lang == want


def test_bucket_survives_repartitioning(spark, sf_dir):
    """The selling point of md5 buckets over rand(seed): partitioning
    must not change any row's assignment."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    a = {r["doc_id"]: r["b"] for r in d.select("doc_id", _bucket100(F.col("doc_id")).alias("b")).collect()}
    b = {
        r["doc_id"]: r["b"]
        for r in d.repartition(7, "doc_id")
        .select("doc_id", _bucket100(F.col("doc_id")).alias("b"))
        .collect()
    }
    assert a == b


def test_bucket_matches_independent_python_md5(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id").limit(200)
    got = {r["doc_id"]: r["b"] for r in d.select("doc_id", _bucket100(F.col("doc_id")).alias("b")).collect()}
    for doc_id, b in got.items():
        want = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100
        assert b == want, doc_id


def test_chunking_tiles_every_document(spark, sf_dir):
    """Per doc: chunk ids are contiguous from 0, there are exactly
    ceil(n_words / stride) chunks, every chunk is <= LEN tokens, and
    full-size chunks are exactly LEN."""
    d = load_table(spark, sf_dir, "documents")
    n_words = {
        r["doc_id"]: r["n"]
        for r in d.select("doc_id", F.size(F.split("text", r"\s+")).alias("n")).collect()
    }
    chunks = QUERIES["q75_chunk_docs"].spark_fn(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {k for k, n in n_words.items() if n >= 1}
    for doc_id, rows in by_doc.items():
        n = n_words[doc_id]
        ids = sorted(r["chunk_id"] for r in rows)
        assert ids == list(range(len(ids)))
        assert len(ids) == math.ceil(n / _CHUNK_STRIDE)
        for r in rows:
            start = r["chunk_id"] * _CHUNK_STRIDE + 1
            want = min(_CHUNK_LEN, n - start + 1)
            assert r["n_tokens"] == want, (doc_id, r["chunk_id"])


def test_stratified_sample_subset_and_rates(spark, sf_dir):
    """Sampled counts must equal the python-side bucket filter count
    per lang (independent re-derivation of the whole query)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    rates = {"en": 10, "de": 50, "fr": 50, "zh": 25, "es": 25}
    want: dict[str, int] = {}
    for r in d:
        b = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16) % 100
        if r["lang"] in rates and b < rates[r["lang"]]:
            want[r["lang"]] = want.get(r["lang"], 0) + 1
    got = {
        r["lang"]: r["n_sampled"]
        for r in QUERIES["q72_stratified_sample"].spark_fn(spark, sf_dir).collect()
    }
    assert got == want


def test_split_leakage_detects_planted_cross_split_duplicate(spark):
    """q114's logic on planted data: a text duplicated under two ids
    that hash into different splits is reported; unique texts and
    same-split duplicates are not."""
    from file_appender_spark.queries.pipeline import split_leakage_report

    # find two ids in different splits and two in the same split
    import hashlib

    def split_of(i):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
        return "train" if b < 80 else ("valid" if b < 90 else "test")

    ids = list(range(200))
    cross = next(
        (a, b) for a in ids for b in ids if a < b and split_of(a) != split_of(b)
    )
    same = next(
        (a, b)
        for a in ids
        for b in ids
        if a < b and {a, b} != set(cross) and split_of(a) == split_of(b) == "train"
    )
    rows = [
        (cross[0], "leaked document text"),
        (cross[1], "leaked document text"),
        (same[0], "benign duplicate"),
        (same[1], "benign duplicate"),
        (999, "unique text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = split_leakage_report(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_splits"] == 2 and r["n_docs"] == 2
    assert r["example_doc_id"] == cross[0]
