"""r12 probe: single-evaluation "sides" restructure of the capped
wjaccard / containment candidate machinery.

WJACCARD_TERMS_PROBE_r12 attribution: the windows are ~free (pre ~=
ranked), but the [tf -> df join-back -> windows] subtree is evaluated
once per JOIN ARM (prefix, bside) plus again for the verify's occ
frame — and the bench's single cold call additionally pays Catalyst
planning over the duplicated trees. The restructure computes ONE
per-(doc, token) frame carrying BOTH membership flags (is-prefix,
is-bside) with expressions byte-identical to the shipped ones, then
derives both join arms and (for wjaccard) the occ verify frame from
it; `mode` controls whether that frame is materialized (lazy
localCheckpoint / persist) or left to recompute per consumer.

Methodology: one fresh JVM per invocation (argv[1] = arm), corpus
pinned, ONE timed cold call per operator — exactly bench.py's shape
(the TFPERSIST_PROBE_r12 discipline; warm in-session reps lie here).
argv[1] = 'equal' instead asserts pair-set equality of every variant
against the shipped operators in both exceptAll directions.

Aggregated by scripts/run_sides_ckpt_r12.sh -> SIDES_CKPT_PROBE_r12.json
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W

from file_appender_spark.operators.containment import containment_pairs
from file_appender_spark.operators.wjaccard import weighted_jaccard_pairs
from file_appender_spark.session import get_spark
from scripts.probe_containment import corpus as z_corpus
from scripts.probe_wjaccard import corpus as wj_corpus


def _mat(df: DataFrame, mode: str) -> DataFrame:
    if mode == "ckpt":
        return df.localCheckpoint(eager=False)
    if mode == "persist":
        return df.persist()
    return df


def wj_sides(docs: DataFrame, mode: str, threshold: float = 0.5, cap: int = 100):
    """Restructured capped weighted_jaccard_pairs: expressions are the
    shipped ones verbatim; only the DAG wiring differs (one sides
    frame, occ reuses the window's hash(_id) partitioning)."""
    from file_appender_spark.operators.wjaccard import _tf

    tf = _tf(docs, "doc_id", "text", r"\s+")
    tfh = tf.withColumn("_th", F.xxhash64("tok"))
    tok_df = tfh.groupBy("_th").agg(F.count("*").alias("_df"))
    ranked = tfh.join(tok_df, "_th")
    ord_w = W.partitionBy("_id").orderBy("_df", "tok")
    doc_w = W.partitionBy("_id")
    pre = ranked.withColumn("_cum", F.sum("tf").over(ord_w)).withColumn(
        "_sz", F.sum("tf").over(doc_w)
    )
    sides = _mat(
        pre.select(
            "_id",
            "tok",
            "tf",
            "_th",
            (
                (F.col("_cum") - F.col("tf"))
                <= (1.0 - threshold) * F.col("_sz") + 1e-9
            ).alias("_isp"),
            (F.col("_df") <= cap).alias("_isb"),
        ),
        mode,
    )
    a = sides.filter("_isp").select("_id", "_th").alias("a")
    b = sides.filter("_isb").select("_id", "_th").alias("b")
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
    occ = sides.groupBy("_id").agg(
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


def cont_sides(docs: DataFrame, mode: str, threshold: float = 0.9, cap: int = 100):
    """Restructured capped containment_pairs: one sides frame feeds
    both candidate arms; the verify keeps its shipped arr64 spelling
    (an independent cheap subtree over the persisted docs)."""
    arr = docs.select(
        F.col("doc_id").alias("_id"),
        F.array_distinct(F.split(F.col("text"), r"\s+")).alias("_toks"),
    )
    toks = arr.select("_id", F.explode("_toks").alias("tok")).withColumn(
        "_th", F.xxhash64("tok")
    )
    tok_df = toks.groupBy("_th").agg(F.count("*").alias("_df"))
    ranked = toks.join(tok_df, "_th")
    w = W.partitionBy("_id").orderBy("_df", "tok")
    nw = W.partitionBy("_id")
    sides = _mat(
        ranked.withColumn("_pos", F.row_number().over(w))
        .withColumn(
            "_k",
            F.count("*").over(nw)
            - F.ceil(F.lit(threshold) * F.count("*").over(nw) - 1e-9)
            + 1,
        )
        .select(
            "_id",
            "_th",
            (F.col("_pos") <= F.col("_k")).alias("_isp"),
            (F.col("_df") <= cap).alias("_isb"),
        ),
        mode,
    )
    a = sides.filter("_isp").select("_id", "_th").alias("a")
    b = sides.filter("_isb").select("_id", "_th").alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._th") == F.col("b._th")) & (F.col("a._id") != F.col("b._id")),
        )
        .select(F.col("a._id").alias("d_sub"), F.col("b._id").alias("d_super"))
        .distinct()
    )
    arr64 = arr.select(
        "_id", F.expr("transform(_toks, t -> xxhash64(t))").alias("_toks64")
    )
    sub = arr64.select(F.col("_id").alias("d_sub"), F.col("_toks64").alias("_sub_toks"))
    sup = arr64.select(
        F.col("_id").alias("d_super"), F.col("_toks64").alias("_sup_toks")
    )
    i = F.size(F.array_intersect("_sub_toks", "_sup_toks"))
    cont = i.cast("double") / F.size("_sub_toks")
    return (
        cand.join(sub, "d_sub")
        .join(sup, "d_super")
        .filter(cont >= threshold)
        .select("d_sub", "d_super", F.round(cont, 6).alias("containment"))
    )


def main() -> None:
    arm = sys.argv[1] if len(sys.argv) > 1 else "base"
    spark = get_spark(app_name=f"probe_sides_ckpt[{arm}]")
    spark.sparkContext.setLogLevel("ERROR")
    wdocs, _ = wj_corpus(spark, 20_000)
    wdocs = wdocs.persist()
    wdocs.count()
    zdocs, _ = z_corpus(spark, 20_000)
    zdocs = zdocs.persist()
    zdocs.count()

    if arm == "equal":
        base_w = weighted_jaccard_pairs(wdocs, threshold=0.5, token_df_cap=100)
        base_c = containment_pairs(zdocs, threshold=0.9, token_df_cap=100)
        for mode in ("none", "ckpt", "persist"):
            vw = wj_sides(wdocs, mode)
            assert vw.exceptAll(base_w).count() == 0, f"wj {mode}: extra rows"
            assert base_w.exceptAll(vw).count() == 0, f"wj {mode}: missing rows"
            vc = cont_sides(zdocs, mode)
            assert vc.exceptAll(base_c).count() == 0, f"cont {mode}: extra rows"
            assert base_c.exceptAll(vc).count() == 0, f"cont {mode}: missing rows"
            print(f"mode {mode}: equal both ways (wj + containment)")
        spark.stop()
        return

    out = {"arm": arm}
    if arm == "base":
        wj = lambda: weighted_jaccard_pairs(  # noqa: E731
            wdocs, threshold=0.5, token_df_cap=100
        ).count()
        ct = lambda: containment_pairs(  # noqa: E731
            zdocs, threshold=0.9, token_df_cap=100
        ).count()
    else:
        wj = lambda: wj_sides(wdocs, arm).count()  # noqa: E731
        ct = lambda: cont_sides(zdocs, arm).count()  # noqa: E731

    t0 = time.perf_counter()
    wj()
    out["wj_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    ct()
    out["cont_sec"] = round(time.perf_counter() - t0, 3)
    print("PROBE_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
