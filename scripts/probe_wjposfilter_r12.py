"""r12 probe: weighted positional filter (PPJoin+ family) on the
capped weighted-Jaccard candidate join — MEASURED AND REJECTED.

Hypothesis: filtering each matched (prefix-token, posting) row by the
lossless intersection upper bound

    ub = min(preA, preB) + min(remA, remB)  >=  sum_min(A, B)

against the threshold requirement I >= t/(1+t) * (|A|+|B|) (J_w >= t
iff that) would shrink the candidate set before the distinct and the
verify joins. The bound is sound with zero knowledge of prior
overlap, so pruned rows can only belong to pairs the exact verify
would reject — the emitted pair set is provably unchanged.

Measured on the bench's 20k-doc Zipf corpus (threshold 0.5, cap 100):
matched rows 3,910,085 -> 3,850,032 kept (1.5% pruned); candidate
pairs 1,995,108 -> 1,954,420 (2.0% pruned). The corpus's similar doc
sizes make min(pre)+min(rem) nearly always exceed the requirement, so
the filter would add two longs per join row and a per-row predicate
to prune ~2% — shipped: NOTHING (WJPOSFILTER_PROBE_r12.json).

A tighter bound needs per-pair state (overlap accumulated in token
order — PPJoin's index-nested-loop formulation), which does not map
onto the equi-join + distinct shape without a per-pair aggregation
that costs more than the verify it would save at this candidate
volume.
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from file_appender_spark.operators.wjaccard import _tf
from file_appender_spark.session import get_spark
from scripts.probe_wjaccard import corpus as wj_corpus


def main() -> None:
    spark = get_spark(app_name="probe_wjposfilter_r12")
    spark.sparkContext.setLogLevel("ERROR")
    docs, _ = wj_corpus(spark, 20_000)
    docs = docs.persist()
    docs.count()
    threshold, cap = 0.5, 100
    tf = _tf(docs, "doc_id", "text", r"\s+")
    tfh = tf.withColumn("_th", F.xxhash64("tok"))
    tok_df = tfh.groupBy("_th").agg(F.count("*").alias("_df"))
    ranked = tfh.join(tok_df, "_th")
    ord_w = W.partitionBy("_id").orderBy("_df", "tok")
    doc_w = W.partitionBy("_id")
    pre = ranked.withColumn("_cum", F.sum("tf").over(ord_w)).withColumn(
        "_sz", F.sum("tf").over(doc_w)
    )
    sides = pre.select(
        "_id",
        "tok",
        "tf",
        "_th",
        "_cum",
        "_sz",
        (
            (F.col("_cum") - F.col("tf"))
            <= (1.0 - threshold) * F.col("_sz") + 1e-9
        ).alias("_isp"),
        (F.col("_df") <= cap).alias("_isb"),
    ).localCheckpoint(eager=False)
    a = sides.filter("_isp").select("_id", "_th", "tf", "_cum", "_sz").alias("a")
    b = sides.filter("_isb").select("_id", "_th", "tf", "_cum", "_sz").alias("b")
    j = a.join(
        b, (F.col("a._th") == F.col("b._th")) & (F.col("a._id") != F.col("b._id"))
    )
    pre_a = F.col("a._cum") - F.col("a.tf")
    pre_b = F.col("b._cum") - F.col("b.tf")
    ub = F.least(pre_a, pre_b) + F.least(
        F.col("a._sz") - pre_a, F.col("b._sz") - pre_b
    )
    req = F.lit(threshold / (1.0 + threshold)) * (F.col("a._sz") + F.col("b._sz"))
    kept = j.filter(ub >= req - 1e-9)

    def pairs(df):
        return (
            df.select(
                F.least("a._id", "b._id").alias("d1"),
                F.greatest("a._id", "b._id").alias("d2"),
            )
            .distinct()
            .count()
        )

    out = {
        "probe": "r12_wjposfilter",
        "docs": 20_000,
        "matched_rows": j.count(),
        "matched_rows_kept": kept.count(),
        "candidate_pairs": pairs(j),
        "candidate_pairs_kept": pairs(kept),
        "decision": "rejected: ~2% pruning does not pay for the carried columns + predicate",
    }
    print(json.dumps(out, indent=1))
    with open("WJPOSFILTER_PROBE_r12.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
