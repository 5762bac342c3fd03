"""r13 probe (r12 verdict task 2): term-level re-attribution of
pairstore_build and the curate recompute funnel — the two most
expensive untouched bench paths (pairstore 3.1-3.8s idle, curate
recompute 3.5-5.3s; last broken down r10).

Methodology: one JVM, sf0.1 documents, each term timed through the
noop sink (guide §1.4 — full-column evaluation, no result transfer)
with jobs labeled (§1.5). Terms share upstream persists exactly the
way the operators do, so a term's time is ITS marginal cost in the
real structure (e.g. t_cand is the band self-join given persisted
sigs, not including signature compute). Run the whole file twice and
keep the second JSON if the first was a cold-cache artifact — or
compare; both are printed.

Usage: python scripts/probe_pcbreak_r13.py [sf_dir] > PCBREAK_r13.json
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from file_appender_spark.session import get_spark
from file_appender_spark.sources.catalog import load_table


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    out = fn()
    dt = round(time.perf_counter() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    print(f"# {label}: {dt}s", file=sys.stderr)
    return dt, out


def pairstore_terms(spark, docs) -> dict:
    from file_appender_spark.operators.components import dedup_clusters
    from file_appender_spark.operators.neardup_ingest import (
        _band_pairs,
        _bands_hash_long,
    )
    from file_appender_spark.operators.pairstore import (
        _FH_COLS,
        _N_BANDS,
        _new_side,
        _old_side,
        _verified_pairs,
        _with_sig_hashes,
        pair_signatures,
    )

    out = {}
    # 1. signature projection alone (no persist), full columns
    out["t_sigs_noop"], _ = timed(
        spark, "pcbreak: pair_signatures noop",
        lambda: noop(_with_sig_hashes(pair_signatures(docs))),
    )
    # 2. the build's actual persist+materialize
    sigs = _with_sig_hashes(pair_signatures(docs)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    out["t_sigs_persist"], _ = timed(
        spark, "pcbreak: sigs persist materialize", lambda: noop(sigs)
    )
    bands = _bands_hash_long(sigs, _N_BANDS, "doc_id", _FH_COLS).select(
        "doc_id", "band", F.col("bh").alias("sig")
    )
    cand = _band_pairs(bands, bands, "doc_id", within_batch=True,
                       band_bucket_cap=None)
    # 3. candidate self-join + distinct, given persisted sigs
    out["t_cand_noop"], _ = timed(
        spark, "pcbreak: band candidates noop", lambda: noop(cand)
    )
    pairs = _verified_pairs(
        cand, _new_side(sigs, "doc_id"), _old_side(sigs, "doc_id"), 0.2
    )
    # 4. exact sh32 verify on top of candidates
    out["t_verify_noop"], _ = timed(
        spark, "pcbreak: verified pairs noop", lambda: noop(pairs)
    )
    td = tempfile.mkdtemp(prefix="pcbreak_")
    try:
        # 5-6. the two epoch writes (real parquet IO, like the build)
        out["t_write_sigs"], _ = timed(
            spark, "pcbreak: sigs epoch write",
            lambda: sigs.write.mode("overwrite").parquet(td + "/sigs"),
        )
        out["t_write_pairs"], _ = timed(
            spark, "pcbreak: pairs epoch write",
            lambda: pairs.write.mode("overwrite").parquet(td + "/pairs"),
        )
        sigs.unpersist()
        # 7. CC over the written pairs (refresh_clusters' core)
        pw = spark.read.parquet(td + "/pairs").select("d1", "d2")
        out["t_cc_noop"], _ = timed(
            spark, "pcbreak: dedup_clusters noop",
            lambda: noop(dedup_clusters(pw)),
        )
        # 8. clusters write at refresh's repartition
        cl = dedup_clusters(pw).select("doc", "cluster")
        out["t_write_clusters"], _ = timed(
            spark, "pcbreak: clusters write",
            lambda: cl.repartition(
                max(1, spark.sparkContext.defaultParallelism // 8)
            ).write.mode("overwrite").parquet(td + "/clusters"),
        )
    finally:
        shutil.rmtree(td, ignore_errors=True)
    # 9. reference: the real build end-to-end
    from file_appender_spark.operators.pairstore import build_pair_graph

    gd = tempfile.mkdtemp(prefix="pcbreak_build_")
    try:
        out["t_build_full"], _ = timed(
            spark, "pcbreak: build_pair_graph full",
            lambda: build_pair_graph(spark, docs, gd),
        )
    finally:
        shutil.rmtree(gd, ignore_errors=True)
    return out


def curate_terms(spark, docs) -> dict:
    from file_appender_spark.curate import quality_keep, scrub_expr, split_col
    from file_appender_spark.operators.neardup_ingest import minhash_signatures
    from file_appender_spark.queries.llm import _WS, let_expr, shingle_expr

    out = {}
    out["t_input_count"], n_input = timed(
        spark, "cbreak: input count", lambda: docs.count()
    )
    keep = (
        docs.withColumn("_h", F.sha2("text", 256))
        .groupBy("_h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    d1 = docs.join(keep, "doc_id")
    out["t_exact_count"], _ = timed(
        spark, "cbreak: exact dedup count", lambda: d1.count()
    )
    words = F.split("text", _WS)
    shingled = (
        d1.filter(F.size(words) >= 3)
        .select("doc_id", let_expr(words, shingle_expr).alias("shingles"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out["t_shingle_persist"], _ = timed(
        spark, "cbreak: shingled persist", lambda: noop(shingled)
    )
    sigs = minhash_signatures(None, "doc_id", shingled=shingled)
    out["t_sigs_noop"], _ = timed(
        spark, "cbreak: minhash sigs noop", lambda: noop(sigs)
    )
    bands = sigs.select(
        "doc_id",
        F.expr(
            "stack(4, " + ", ".join(f"{bi}, b{bi}" for bi in range(4))
            + ") AS (band, sig)"
        ),
    )
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2"))
        .distinct()
    )
    out["t_cand_noop"], _ = timed(
        spark, "cbreak: band candidates noop", lambda: noop(cand)
    )
    sh1 = shingled.select(F.col("doc_id").alias("d1"), F.col("shingles").alias("sa"))
    sh2 = shingled.select(F.col("doc_id").alias("d2"), F.col("shingles").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = inter.cast("double") / (F.size("sa") + F.size("sb") - inter)
    pairs = cand.join(sh1, "d1").join(sh2, "d2").filter(jac >= 0.2).select("d1", "d2")
    out["t_verify_noop"], _ = timed(
        spark, "cbreak: verify pairs noop", lambda: noop(pairs)
    )
    drop = pairs.select(F.col("d2").alias("doc_id")).distinct()
    d2 = d1.join(drop, "doc_id", "left_anti").persist(StorageLevel.MEMORY_AND_DISK)
    out["t_near_count"], _ = timed(
        spark, "cbreak: near survivors count", lambda: d2.count()
    )
    d3 = d2.filter(quality_keep("alpha", 0.45))
    out["t_quality_count"], _ = timed(
        spark, "cbreak: quality count", lambda: d3.count()
    )
    d4 = d3.withColumn("text", scrub_expr("digits")).withColumn("split", split_col())
    td = tempfile.mkdtemp(prefix="cbreak_")
    try:
        out["t_shard_write"], _ = timed(
            spark, "cbreak: shard write",
            lambda: d4.write.mode("overwrite").partitionBy("split").parquet(
                td + "/out"
            ),
        )
        out["t_readback_counts"], _ = timed(
            spark, "cbreak: written counts",
            lambda: (
                spark.read.parquet(td + "/out").count(),
                spark.read.parquet(td + "/out")
                .groupBy("split").agg(F.count("*")).collect(),
            ),
        )
    finally:
        shutil.rmtree(td, ignore_errors=True)
    shingled.unpersist()
    d2.unpersist()
    # reference: the real funnel end-to-end
    from file_appender_spark.curate import curate

    cd = tempfile.mkdtemp(prefix="cbreak_full_")
    try:
        out["t_curate_full"], _ = timed(
            spark, "cbreak: curate full",
            lambda: curate(spark, docs, cd + "/out"),
        )
    finally:
        shutil.rmtree(cd, ignore_errors=True)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="probe_pcbreak_r13")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()  # warm listing/footers
    res = {
        "sf_dir": sf_dir,
        "pairstore": pairstore_terms(spark, docs),
        "curate": curate_terms(spark, docs),
    }
    t0 = time.perf_counter()
    spark.range(100_000_000).selectExpr("sum(id) AS s").collect()
    res["calib_jvm_range_sum_1e8_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
