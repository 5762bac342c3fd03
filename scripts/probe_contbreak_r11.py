#!/usr/bin/env python
"""Round-11 follow-on: term-level breakdown of op_containment_capped
(the second-largest bench extra, ~4.5-6.2s) with the BREAKDOWN method
— materialize each stage once, time each downstream term off the
checkpoint, so end-to-end noise cannot mis-attribute.

Stages of containment_pairs(threshold=0.9, token_df_cap=100) on the
bench's own 20k-doc Zipf corpus (scripts/probe_containment.corpus):

  s1  arr build (tokenize + array_distinct)
  s2  tok_df (explode + groupBy(tok))
  s3  ranked join (toks x tok_df — STRING tok keys) + the two
      per-doc prefix windows
  s4  candidate join (prefix x capped-postings on STRING tok) +
      distinct
  s5  exact verify (two id joins + array_intersect over STRING
      token arrays)

Variants measured head-to-head (the wjaccard r11 long-key trick):
  s3/s4 with xxhash64(tok) LONG join keys (prefix ORDER stays on
  (_df, tok) strings so the selected prefix is identical);
  s5 with PRE-HASHED long token arrays (array_intersect over longs;
  |A n B| and |A| are unchanged unless two distinct tokens of one
  candidate pair collide in 64 bits, ~1e-12 at a 20k vocabulary —
  value equality asserted below, and the q129-family driver hashes
  would fail loudly, never silently).

Output: CONTBREAK_PROBE_r11.json.
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
THRESHOLD, CAP = 0.9, 100


def med(fn):
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    return statistics.median(ts), ts


def force(df):
    """Full-column evaluation (the sigstage-probe lesson: a bare
    count() lets Catalyst prune the very expressions under test).
    Columns combine via XOR — addition overflows under ANSI mode."""
    combined = F.xxhash64(df.columns[0])
    for c in df.columns[1:]:
        combined = combined.bitwiseXOR(F.xxhash64(c))
    return df.agg(F.bit_xor(combined)).collect()


def main() -> None:
    spark = get_spark(app_name="probe_contbreak_r11")
    spark.sparkContext.setLogLevel("ERROR")
    from file_appender_spark.operators.containment import containment_pairs
    from scripts.probe_containment import corpus

    docs, _ = corpus(spark, 20_000)
    docs = docs.localCheckpoint(eager=True)
    out = {"probe": "r11_containment_breakdown", "docs": docs.count()}

    # reference end-to-end (warm: first rep discarded by median-of-3)
    e2e, reps = med(
        lambda: containment_pairs(
            docs, threshold=THRESHOLD, token_df_cap=CAP
        ).count()
    )
    out["end_to_end_sec"], out["end_to_end_reps"] = e2e, reps

    # s1: tokenize + distinct
    arr = docs.select(
        F.col("doc_id").alias("_id"),
        F.array_distinct(F.split(F.col("text"), r"\s+")).alias("_toks"),
    )
    out["s1_arr_sec"], _ = med(lambda: force(arr.select("_id", F.xxhash64(F.concat_ws(" ", "_toks")).alias("h"))))
    arr = arr.localCheckpoint(eager=True)
    toks = arr.select("_id", F.explode("_toks").alias("tok"))

    # s2: tok_df
    tok_df = toks.groupBy("tok").agg(F.count("*").alias("_df"))
    out["s2_tokdf_sec"], _ = med(lambda: force(tok_df))
    tok_df = tok_df.localCheckpoint(eager=True)

    # s3: ranked join + prefix windows — string vs long keys
    def prefix_of(ranked):
        w = W.partitionBy("_id").orderBy("_df", "tok")
        nw = W.partitionBy("_id")
        return (
            ranked.withColumn("_pos", F.row_number().over(w))
            .withColumn(
                "_k",
                F.count("*").over(nw)
                - F.ceil(F.lit(THRESHOLD) * F.count("*").over(nw) - 1e-9)
                + 1,
            )
            .filter(F.col("_pos") <= F.col("_k"))
            .select("_id", "tok")
        )

    ranked_s = toks.join(tok_df, "tok")
    out["s3_prefix_string_sec"], _ = med(lambda: force(prefix_of(ranked_s)))

    toks_l = toks.withColumn("th", F.xxhash64("tok"))
    tok_df_l = tok_df.withColumn("th", F.xxhash64("tok")).select("th", "_df")
    ranked_l = toks_l.join(tok_df_l, "th")
    out["s3_prefix_long_sec"], _ = med(lambda: force(prefix_of(ranked_l)))

    # s4: candidate join + distinct — string vs long keys
    ranked_s_ck = ranked_s.localCheckpoint(eager=True)
    prefix_s = prefix_of(ranked_s_ck).localCheckpoint(eager=True)
    bside_s = (
        ranked_s_ck.filter(F.col("_df") <= CAP).select("_id", "tok")
    ).localCheckpoint(eager=True)

    def cand_of(a_df, b_df, key):
        a, b = a_df.alias("a"), b_df.alias("b")
        return (
            a.join(
                b,
                (F.col(f"a.{key}") == F.col(f"b.{key}"))
                & (F.col("a._id") != F.col("b._id")),
            )
            .select(
                F.col("a._id").alias("d_sub"), F.col("b._id").alias("d_super")
            )
            .distinct()
        )

    out["s4_cand_string_sec"], out["s4_cand_string_reps"] = med(
        lambda: cand_of(prefix_s, bside_s, "tok").count()
    )
    prefix_l = prefix_s.withColumn("th", F.xxhash64("tok")).select(
        "_id", "th"
    ).localCheckpoint(eager=True)
    bside_l = bside_s.withColumn("th", F.xxhash64("tok")).select(
        "_id", "th"
    ).localCheckpoint(eager=True)
    out["s4_cand_long_sec"], out["s4_cand_long_reps"] = med(
        lambda: cand_of(prefix_l, bside_l, "th").count()
    )
    cand = cand_of(prefix_s, bside_s, "tok").localCheckpoint(eager=True)
    out["cand_rows"] = cand.count()
    out["cand_rows_long"] = cand_of(prefix_l, bside_l, "th").count()

    # s5: exact verify — string arrays vs pre-hashed long arrays
    def verify(arr_df, toks_col):
        sub = arr_df.select(
            F.col("_id").alias("d_sub"), F.col(toks_col).alias("_sub")
        )
        sup = arr_df.select(
            F.col("_id").alias("d_super"), F.col(toks_col).alias("_sup")
        )
        i = F.size(F.array_intersect("_sub", "_sup"))
        cont = i.cast("double") / F.size("_sub")
        return (
            cand.join(sub, "d_sub")
            .join(sup, "d_super")
            .filter(cont >= THRESHOLD)
            .select("d_sub", "d_super", F.round(cont, 6).alias("containment"))
        )

    out["s5_verify_string_sec"], out["s5_verify_string_reps"] = med(
        lambda: verify(arr, "_toks").count()
    )
    arr_l = arr.withColumn(
        "_toks64", F.expr("transform(_toks, t -> xxhash64(t))")
    ).localCheckpoint(eager=True)
    out["s5_verify_long_sec"], out["s5_verify_long_reps"] = med(
        lambda: verify(arr_l, "_toks64").count()
    )
    # value equality: hashed-array verify must emit identical rows
    diff = (
        verify(arr, "_toks").exceptAll(verify(arr_l, "_toks64")).count()
        + verify(arr_l, "_toks64").exceptAll(verify(arr, "_toks")).count()
    )
    out["verify_valueequal"] = diff == 0

    with open("/root/repo/CONTBREAK_PROBE_r11.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
