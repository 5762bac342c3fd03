#!/usr/bin/env python
"""Round-12 (r11 verdict task 6): is the fused-vs-exploded MinHash
signature crossover SIZED (doc length / batch size) or STRUCTURAL
(shingle-frame reuse)? r11 measured fused 2.1x faster at the ingest
shape (2500 short docs, signatures the only output) but 1.3x slower
inside curate's funnel (5000 longer docs, where the exploded spelling
shares a persisted shingled frame with the exact-Jaccard verify).

This probe isolates the STANDALONE signature stage (forced
full-column evaluation, no reuse) across doc lengths: if fused wins
at every length, the curate slowdown is the reuse structure, not
size, and the dispatch rule is structural.

Output: SIGDISPATCH_PROBE_r12.json
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from file_appender_spark.session import get_spark  # noqa: E402

REPS = 5


def force(df):
    cols = ", ".join(df.columns)
    return df.agg(F.expr(f"bit_xor(xxhash64({cols}))")).collect()[0][0]


def medtime(fn, reps=REPS):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    return statistics.median(ts), ts


def main() -> None:
    spark = get_spark(app_name="probe_sigdispatch_r12")
    spark.sparkContext.setLogLevel("ERROR")
    from file_appender_spark.operators.neardup_ingest import (
        _minhash_sig_frame,
        _minhash_sig_frame_exploded,
    )

    base = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 2 == 1)
        .localCheckpoint(eager=True)
    )
    out = {"probe": "r12_sig_dispatch", "reps": REPS, "shapes": {}}
    for mult, label in [(1, "x1"), (4, "x4"), (16, "x16")]:
        docs = base.select(
            "doc_id",
            F.concat_ws(" ", *([F.col("text")] * mult)).alias("text"),
        ).localCheckpoint(eager=True)
        n = docs.count()
        words = docs.select(
            F.avg(F.size(F.split("text", r"\s+"))).alias("w")
        ).collect()[0]["w"]
        # warm both
        force(_minhash_sig_frame(docs, "doc_id", "text"))
        force(_minhash_sig_frame_exploded(docs, "doc_id", "text"))
        fused, fr = medtime(
            lambda: force(_minhash_sig_frame(docs, "doc_id", "text"))
        )
        expl, er = medtime(
            lambda: force(_minhash_sig_frame_exploded(docs, "doc_id", "text"))
        )
        out["shapes"][label] = {
            "docs": n,
            "avg_words": round(words, 1),
            "fused_sec": fused,
            "fused_reps": fr,
            "exploded_sec": expl,
            "exploded_reps": er,
            "fused_speedup": round(expl / fused, 2),
        }
        print(f"# {label}: {n} docs avg {words:.0f} words — fused {fused}s "
              f"exploded {expl}s ({expl/fused:.2f}x)", file=sys.stderr)
    with open("/root/repo/SIGDISPATCH_PROBE_r12.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out["shapes"]))


if __name__ == "__main__":
    main()
