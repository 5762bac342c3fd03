#!/usr/bin/env python
"""Round-12 (r11 verdict task 4): the last untried wjaccard verify
spelling, measured head-to-head against the shipped map_zip_with
fold on the bench's own 20k-doc Zipf corpus.

Candidate spelling — OCCURRENCE-INDEXED LONG ARRAYS: token t with
tf = c contributes c longs xxhash64(t, 1..c); then

    sum_t min(a_t, b_t)  ==  |array_intersect(occ(A), occ(B))|

exactly (occurrence i of t is in both multisets iff i <= min), so the
weighted intersection is ONE native set-intersect over flat bigint
arrays — no per-candidate union-map materialization, no sort, no
per-key lookups. This is the same family as containment's pre-hashed
array_intersect verify (CONTBREAK_PROBE_r11: 0.72 -> 0.43s) — the
r11 verdict suggested a sorted-merge zip; a true merge needs
iteration Spark HOFs don't have, but the occurrence encoding reduces
weighted-min to the set primitive that IS native.

Value equality asserted on the full verified pair set (d1, d2, wjac).
Collision note: a cross-doc collision of two (tok, i) pairs inflates
one intersection by 1 (~1e-12 birthday odds at corpus scale, the
q163 driver hash fails loudly); within-doc occurrence hashes cannot
collide with each other barring the same 64-bit event.

Output: WJACCARD_BREAKDOWN_r12.json
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from file_appender_spark.session import get_spark  # noqa: E402

REPS = 3


def med(fn):
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    return statistics.median(ts), ts


def occ_verify(cand, tf, threshold):
    """Occurrence-indexed long-array exact verify (candidate)."""
    occ = tf.groupBy("_id").agg(
        F.flatten(
            F.collect_list(
                F.expr("transform(sequence(1, tf), i -> xxhash64(tok, i))")
            )
        ).alias("_occ"),
        F.sum("tf").alias("_sz"),
    )
    o1 = occ.select(
        F.col("_id").alias("d1"), F.col("_occ").alias("_o1"), F.col("_sz").alias("_sz1")
    )
    o2 = occ.select(
        F.col("_id").alias("d2"), F.col("_occ").alias("_o2"), F.col("_sz").alias("_sz2")
    )
    inter = F.size(F.array_intersect("_o1", "_o2")).cast("bigint")
    wjac = inter.cast("double") / (F.col("_sz1") + F.col("_sz2") - inter)
    return (
        cand.join(o1, "d1")
        .join(o2, "d2")
        .filter(wjac >= threshold)
        .select("d1", "d2", F.round(wjac, 6).alias("wjac"))
    )


def main() -> None:
    spark = get_spark(app_name="probe_wjverify_r12")
    spark.sparkContext.setLogLevel("ERROR")
    from file_appender_spark.operators.wjaccard import (
        _exact_verify,
        _tf,
        weighted_jaccard_pairs,
    )
    from scripts.probe_wjaccard import corpus

    docs, _ = corpus(spark, 20_000)
    docs = docs.localCheckpoint(eager=True)
    threshold, cap = 0.5, 100
    out = {"probe": "r12_wjaccard_verify", "docs": docs.count()}

    tf = _tf(docs, "doc_id", "text", r"\s+").localCheckpoint(eager=True)
    # candidates exactly as weighted_jaccard_pairs builds them — reuse
    # the module to avoid drift, then checkpoint so both verify
    # spellings read the same materialized frame
    from pyspark.sql import Window as W

    tok_df = tf.groupBy("tok").agg(F.count("*").alias("_df"))
    th = F.xxhash64("tok")
    ranked = tf.withColumn("_th", th).join(
        tok_df.select(th.alias("_th"), "_df"), "_th"
    )
    ord_w = W.partitionBy("_id").orderBy("_df", "tok")
    doc_w = W.partitionBy("_id")
    pre = ranked.withColumn("_cum", F.sum("tf").over(ord_w)).withColumn(
        "_sz", F.sum("tf").over(doc_w)
    )
    prefix = pre.filter(
        (F.col("_cum") - F.col("tf")) <= (1.0 - threshold) * F.col("_sz") + 1e-9
    ).select("_id", "_th")
    bside = ranked.filter(F.col("_df") <= cap).select("_id", "_th")
    cand = (
        prefix.alias("a")
        .join(
            bside.alias("b"),
            (F.col("a._th") == F.col("b._th"))
            & (F.col("a._id") != F.col("b._id")),
        )
        .select(
            F.least("a._id", "b._id").alias("d1"),
            F.greatest("a._id", "b._id").alias("d2"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    out["cand_rows"] = cand.count()

    # warm both
    _exact_verify(cand, tf, threshold).count()
    occ_verify(cand, tf, threshold).count()

    out["verify_map_zip_sec"], out["verify_map_zip_reps"] = med(
        lambda: _exact_verify(cand, tf, threshold).count()
    )
    out["verify_occ_intersect_sec"], out["verify_occ_intersect_reps"] = med(
        lambda: occ_verify(cand, tf, threshold).count()
    )

    # value equality of the verified pair sets
    a = _exact_verify(cand, tf, threshold)
    b = occ_verify(cand, tf, threshold)
    out["pairs"] = a.count()
    out["pairs_occ"] = b.count()
    out["mismatch_a_minus_b"] = a.exceptAll(b).count()
    out["mismatch_b_minus_a"] = b.exceptAll(a).count()

    # end-to-end with each verify
    out["end_to_end_map_sec"], _ = med(
        lambda: weighted_jaccard_pairs(
            docs, threshold=threshold, token_df_cap=cap
        ).count()
    )

    with open("/root/repo/WJACCARD_BREAKDOWN_r12.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
