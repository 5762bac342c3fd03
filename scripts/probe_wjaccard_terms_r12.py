"""r12 term attribution for the capped weighted-Jaccard pipeline at
the bench's exact shape (20k-doc Zipf corpus, threshold 0.5, cap 100):
time each subtree in isolation through the noop sink (guide §1.4) so
the "rest" beyond candidates+verify — tf explode/groupBy, the df
join-back, the two per-doc windows, the occ-array build — gets a
number each before any respelling. Jobs labeled (§1.5).

Output: WJACCARD_TERMS_PROBE_r12.json
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from file_appender_spark.operators.wjaccard import (
    _exact_verify,
    _tf,
    weighted_jaccard_pairs,
)
from file_appender_spark.session import get_spark
from scripts.probe_wjaccard import corpus as _wj_corpus


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="probe_wjaccard_terms_r12")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    docs, _ = _wj_corpus(spark, 20_000)
    docs = docs.persist()
    docs.count()

    threshold, cap = 0.5, 100
    out: dict = {"probe": "r12_wjaccard_terms", "docs": 20_000}

    def reps(label, fn, n=3):
        ts = []
        for i in range(n):
            sc.setJobDescription(f"wjt[{label}][rep{i}]")
            t0 = time.perf_counter()
            fn()
            ts.append(round(time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        out[label] = ts
        print(label, ts, file=sys.stderr)

    # the operator's internal frames, spelled exactly as the operator
    # builds them (wjaccard.py weighted_jaccard_pairs, capped branch)
    tf = _tf(docs, "doc_id", "text", r"\s+")
    tfh = tf.withColumn("_th", F.xxhash64("tok"))
    tok_df = tfh.groupBy("_th").agg(F.count("*").alias("_df"))
    ranked = tfh.join(tok_df, "_th")
    ord_w = W.partitionBy("_id").orderBy("_df", "tok")
    doc_w = W.partitionBy("_id")
    pre = ranked.withColumn("_cum", F.sum("tf").over(ord_w)).withColumn(
        "_sz", F.sum("tf").over(doc_w)
    )
    prefix = pre.filter(
        (F.col("_cum") - F.col("tf")) <= (1.0 - threshold) * F.col("_sz") + 1e-9
    ).select("_id", "_th")
    bside = ranked.filter(F.col("_df") <= cap).select("_id", "_th")
    a = prefix.alias("a")
    b = bside.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._th") == F.col("b._th")) & (F.col("a._id") != F.col("b._id")),
        )
        .select(
            F.least("a._id", "b._id").alias("d1"),
            F.greatest("a._id", "b._id").alias("d2"),
        )
        .distinct()
    )
    occ = tf.groupBy("_id").agg(
        F.flatten(
            F.collect_list(
                F.expr("transform(sequence(1, tf), i -> xxhash64(tok, i))")
            )
        ).alias("_occ"),
        F.sum("tf").alias("_sz"),
    )

    # warm codegen once end to end
    weighted_jaccard_pairs(docs, threshold=threshold, token_df_cap=cap).count()

    reps("tf_noop", lambda: noop(tf))
    reps("tok_df_noop", lambda: noop(tok_df))
    reps("ranked_noop", lambda: noop(ranked))
    reps("windows_pre_noop", lambda: noop(pre))
    reps("prefix_noop", lambda: noop(prefix))
    reps("bside_noop", lambda: noop(bside))
    reps("cand_count", lambda: cand.count())
    reps("occ_noop", lambda: noop(occ))
    reps("verify_count", lambda: _exact_verify(cand, tf, threshold).count())
    reps(
        "end_to_end_count",
        lambda: weighted_jaccard_pairs(
            docs, threshold=threshold, token_df_cap=cap
        ).count(),
    )

    docs.unpersist()
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "WJACCARD_TERMS_PROBE_r12.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
