#!/usr/bin/env python
"""Round-11 task 7: term-level breakdown of op_wjaccard_capped (the
largest bench extra, ~10s in-sweep / ~9.7s at sf0.001 calibration)
with the BREAKDOWN method — materialize each stage once, time each
downstream term off the checkpoint, so end-to-end noise cannot
mis-attribute.

Stages of weighted_jaccard_pairs(threshold=0.5, token_df_cap=100) on
the bench's own 20k-doc Zipf corpus (scripts/probe_wjaccard.corpus):

  s1  tf build (tokenize explode + groupBy(_id, tok))
  s2  tok_df (groupBy(tok) over tf)
  s3  ranked join + the two per-doc windows + prefix/bside filters
      (STRING-keyed tf x tok_df join; candidate-side inputs)
  s4  candidate join on tok STRING equality + distinct
  s5  exact verify (map build groupBy + two id joins + map fold)

Variant measured head-to-head: v1 = s3+s4 with xxhash64(tok) LONG
join keys (the schema-v2 trick; window ORDER stays on (_df, tok)
strings, so the selected prefix is identical and the oracle-pinned
result cannot drift — a 64-bit key collision would merge two tokens'
postings, which the q163 driver hash would catch loudly; with a
~20k-word vocabulary the probability is ~1e-12).

Output: WJACCARD_BREAKDOWN_r11.json.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window as W  # noqa: E402

from file_appender_spark.session import get_spark  # noqa: E402

REPS = 3


def med(fn):
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    return statistics.median(ts), ts


def main() -> None:
    spark = get_spark(app_name="probe_wjbreak_r11")
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
    out = {"probe": "r11_wjaccard_breakdown", "docs": docs.count()}

    # warm-up: one full run
    weighted_jaccard_pairs(docs, threshold=threshold, token_df_cap=cap).count()

    out["end_to_end_sec"], out["end_to_end_reps"] = med(
        lambda: weighted_jaccard_pairs(
            docs, threshold=threshold, token_df_cap=cap
        ).count()
    )

    # s1: tf build
    out["s1_tf_sec"], _ = med(
        lambda: _tf(docs, "doc_id", "text", r"\s+").count()
    )
    tf = _tf(docs, "doc_id", "text", r"\s+").localCheckpoint(eager=True)

    # s2: tok_df
    out["s2_tokdf_sec"], _ = med(
        lambda: tf.groupBy("tok").agg(F.count("*").alias("_df")).count()
    )
    tok_df = (
        tf.groupBy("tok").agg(F.count("*").alias("_df"))
        .localCheckpoint(eager=True)
    )

    def prefix_bside(join_key):
        ranked = tf.join(tok_df, "tok")
        if join_key == "long":
            th = F.xxhash64("tok")
            ranked = tf.withColumn("_th", F.xxhash64("tok")).join(
                tok_df.select(
                    F.xxhash64("tok").alias("_th"), "_df"
                ),
                "_th",
            )
        ord_w = W.partitionBy("_id").orderBy("_df", "tok")
        doc_w = W.partitionBy("_id")
        pre = ranked.withColumn("_cum", F.sum("tf").over(ord_w)).withColumn(
            "_sz", F.sum("tf").over(doc_w)
        )
        key = "_th" if join_key == "long" else "tok"
        prefix = pre.filter(
            (F.col("_cum") - F.col("tf"))
            <= (1.0 - threshold) * F.col("_sz") + 1e-9
        ).select("_id", key)
        bside = ranked.filter(F.col("_df") <= cap).select("_id", key)
        return prefix, bside, key

    # s3: ranked join + windows + filters (string keys)
    out["s3_prefix_string_sec"], _ = med(
        lambda: prefix_bside("string")[0].count()
    )
    out["s3_prefix_long_sec"], _ = med(
        lambda: prefix_bside("long")[0].count()
    )

    def cand_of(join_key):
        prefix, bside, key = prefix_bside(join_key)
        a, b = prefix.alias("a"), bside.alias("b")
        return (
            a.join(
                b,
                (F.col(f"a.{key}") == F.col(f"b.{key}"))
                & (F.col("a._id") != F.col("b._id")),
            )
            .select(
                F.least("a._id", "b._id").alias("d1"),
                F.greatest("a._id", "b._id").alias("d2"),
            )
            .distinct()
        )

    # s4: candidate join, string vs long keys (includes s3 upstream,
    # both spellings share it — the DELTA is the join-key effect)
    out["s4_cand_string_sec"], out["s4_cand_string_reps"] = med(
        lambda: cand_of("string").count()
    )
    out["s4_cand_long_sec"], out["s4_cand_long_reps"] = med(
        lambda: cand_of("long").count()
    )
    out["cand_rows"] = cand_of("string").count()
    out["cand_rows_long"] = cand_of("long").count()

    # s5: exact verify off a checkpointed candidate set — the
    # PRODUCTION spelling (long-keyed maps since r11) vs the old
    # string-keyed maps, kept here as the rejected baseline
    cand = cand_of("string").localCheckpoint(eager=True)
    out["s5_verify_sec"], out["s5_verify_reps"] = med(
        lambda: _exact_verify(cand, tf, threshold).count()
    )

    def _verify_string_keys(cand, tf, threshold):
        maps = tf.groupBy("_id").agg(
            F.map_from_entries(
                F.collect_list(F.struct("tok", "tf"))
            ).alias("_m"),
            F.sum("tf").alias("_sz"),
        )
        m1 = maps.select(
            F.col("_id").alias("d1"), F.col("_m").alias("_m1"),
            F.col("_sz").alias("_sz1"),
        )
        m2 = maps.select(
            F.col("_id").alias("d2"), F.col("_m").alias("_m2"),
            F.col("_sz").alias("_sz2"),
        )
        inter = F.aggregate(
            F.map_values(
                F.map_zip_with(
                    "_m1", "_m2",
                    lambda k, v1, v2: F.least(
                        F.coalesce(v1, F.lit(0)), F.coalesce(v2, F.lit(0))
                    ),
                )
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        wjac = inter.cast("double") / (F.col("_sz1") + F.col("_sz2") - inter)
        return (
            cand.join(m1, "d1").join(m2, "d2")
            .filter(wjac >= threshold)
            .select("d1", "d2", F.round(wjac, 6).alias("wjac"))
        )

    out["s5_verify_stringkeys_sec"], _ = med(
        lambda: _verify_string_keys(cand, tf, threshold).count()
    )
    # value pin: the two verifies must agree exactly
    a = _exact_verify(cand, tf, threshold)
    b = _verify_string_keys(cand, tf, threshold)
    out["verify_bitequal"] = (
        a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    )

    with open("/root/repo/WJACCARD_BREAKDOWN_r11.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
