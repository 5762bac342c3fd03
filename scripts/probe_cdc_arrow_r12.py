"""r12 probe: the vectorized Arrow per-text CDC stage vs the JVM
interpreted-HOF spelling (guide §4.2; operators/chunking.py).

Both arms run in one session on the bench corpus (sf0.1 documents,
the exact op_cdc_rolling shape): the JVM arm is forced through the
dispatch by passing Java \\s+'s explicit ASCII class as ``ws`` —
same tokenization, same plan as the pre-r12 code except the regex
literal. Stage isolation uses the noop sink (guide §1.4); the
operator rows are bench-shape counts. Equality between arms is
asserted on the full output frame (it is also pinned corpus-free in
tests/test_tranche5b.py).

Output: CDC_ARROW_PROBE_r12.json
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from file_appender_spark.operators.chunking import (
    _JAVA_WS_CLASS,
    cdc_chunk_stats_rolling,
)
from file_appender_spark.session import get_spark
from file_appender_spark.sources.catalog import load_table


def main() -> None:
    spark = get_spark(app_name="probe_cdc_arrow_r12")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    d = load_table(spark, "/root/testdata/sf0.1", "documents")
    warm = load_table(spark, "/root/testdata/sf0.001", "documents")
    cdc_chunk_stats_rolling(warm).collect()  # warm codegen (bench does too)
    cdc_chunk_stats_rolling(warm, ws=_JAVA_WS_CLASS).collect()

    out: dict = {"probe": "r12_cdc_arrow", "corpus": "sf0.1 documents"}

    def reps(label, fn, n=4):
        ts = []
        for i in range(n):
            sc.setJobDescription(f"cdc[{label}][rep{i}]")
            t0 = time.perf_counter()
            fn()
            ts.append(round(time.perf_counter() - t0, 3))
        return ts

    out["jvm_full_sec"] = reps(
        "jvm", lambda: cdc_chunk_stats_rolling(d, ws=_JAVA_WS_CLASS).count()
    )
    out["arrow_full_sec"] = reps("arrow", lambda: cdc_chunk_stats_rolling(d).count())

    # stage isolation: the per-text frame only, forced full-column
    # evaluation through the noop sink
    ws_col = F.filter(F.split(F.col("text"), _JAVA_WS_CLASS), lambda x: x != "")
    from file_appender_spark.operators.chunking import (
        _cdc_per_text_arrow,
        rolling_chunk_hashes,
    )
    from file_appender_spark.operators.textstats import let_expr

    dt = (
        d.filter(F.size(ws_col) >= 1)
        .select(F.sha2(F.col("text"), 256).alias("tk"), F.col("text").alias("text"))
        .groupBy("tk")
        .agg(F.count("*").alias("n_docs"), F.min("text").alias("text"))
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    jvm_stage = dt.select(
        "tk",
        "n_docs",
        F.size(ws_col_t := F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")).alias("n_words"),
        let_expr(ws_col_t, lambda t: rolling_chunk_hashes(t)).alias("hs"),
    )
    arrow_stage = dt.mapInArrow(
        _cdc_per_text_arrow(4, 3),
        schema="tk string, n_docs bigint, n_words int, hs array<string>",
    )
    out["jvm_stage_noop_sec"] = reps("jvm_stage", lambda: noop(jvm_stage))
    out["arrow_stage_noop_sec"] = reps("arrow_stage", lambda: noop(arrow_stage))

    a = sorted(map(tuple, cdc_chunk_stats_rolling(d).collect()))
    b = sorted(map(tuple, cdc_chunk_stats_rolling(d, ws=_JAVA_WS_CLASS).collect()))
    out["rows"] = len(a)
    out["equal"] = a == b
    assert out["equal"], "arm outputs diverged"

    # the scale axis: doc LENGTH (the interpreted HOF costs
    # window x positions Catalyst-node evaluations per text; the
    # Arrow pass amortizes). 10x-longer distinct texts, same corpus.
    long_d = d.select(
        "doc_id",
        F.concat_ws(
            " ",
            *[
                F.concat(F.col("text"), F.lit(f" s{i}x"), F.col("doc_id").cast("string"))
                for i in range(10)
            ],
        ).alias("text"),
    ).persist()
    long_d.count()
    out["jvm_10xlen_sec"] = reps(
        "jvm10x", lambda: cdc_chunk_stats_rolling(long_d, ws=_JAVA_WS_CLASS).count(), 3
    )
    out["arrow_10xlen_sec"] = reps(
        "arrow10x", lambda: cdc_chunk_stats_rolling(long_d).count(), 3
    )
    la = sorted(map(tuple, cdc_chunk_stats_rolling(long_d).collect()))
    lb = sorted(
        map(tuple, cdc_chunk_stats_rolling(long_d, ws=_JAVA_WS_CLASS).collect())
    )
    out["equal_10xlen"] = la == lb
    assert out["equal_10xlen"], "long-doc arm outputs diverged"

    with open("CDC_ARROW_PROBE_r12.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
