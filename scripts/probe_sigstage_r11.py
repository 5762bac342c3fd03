"""Round-11 task 1 probe: the signature-stage floor.

r10 attributed the ingest floor to the oracle-pinned signature
computation itself (BREAKDOWN epoch_sig_sec 1.48s per 2500-doc batch).
This probe measures the exploded REFERENCE spelling of the MinHash
stage (one row per shingle -> md5 -> groupBy(doc) with 16 min
aggregates -> one exchange) against the FUSED production spelling
(hash each shingle once via transform, fold all 16 affine mins in one
aggregate() HOF per row — no explode, no exchange), with a
bit-equality pin between the two.

Also measures (and REJECTS — kept here for the record, never shipped)
a fused per-row strided-fold spelling of the image aHash stage: 64
interpreted aggregate() folds per row lose ~4x to the exploded
codegen'd groupBy pipeline, so ahash_wide keeps its two-exchange
shape. The interpreted-HOF cost model differs from the text case
because the text fold is ONE aggregate over ~40 shingles, not 64
aggregates over byte strides.

Method per memory/spark-gotchas: session warm-up first, warm medians
of >= 3 reps, batch sizes matching bench.py's ingest extras (the
sf0.1 documents halves, 2500 docs).
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from file_appender_spark.session import get_spark
from file_appender_spark.sources.catalog import load_table

REPS = 5
SF_DIR = "/root/testdata/sf0.1"


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def force(df):
    """Force EVERY output column: a bare count() lets Catalyst prune
    the expensive signature expressions out of the plan entirely
    (caught mid-round — the first cut of this probe under-measured
    both spellings that way). bit_xor never overflows under ANSI."""
    cols = ", ".join(df.columns)
    return df.agg(F.expr(f"bit_xor(xxhash64({cols}))")).collect()[0][0]


def medtime(fn, reps=REPS):
    ts = []
    for _ in range(reps):
        t, _ = timed(fn)
        ts.append(round(t, 3))
    return statistics.median(ts), ts


def ahash_wide_fused(
    df: DataFrame, id_col: str, payload_col: str, grid: int = 64
) -> DataFrame:
    """REJECTED candidate (see module docstring): per-row strided
    folds instead of the per-byte explode + two groupBys. Bit-equal
    to ahash_wide but ~4x slower at the bench batch shape."""
    from file_appender_spark.operators.textstats import let_expr

    w = grid // 4
    n = F.length(F.col(payload_col))
    pairs = F.split(
        F.regexp_replace(F.hex(F.col(payload_col)), "(..)", "$1\x01"), "\x01"
    )
    nb = F.col("n_bytes")

    def bval(p):
        return F.conv(p, 16, 10).cast("bigint")

    def cells_expr(P):
        def cell(c):
            return F.when(
                nb > c,
                F.aggregate(
                    F.sequence(F.lit(c + 1), nb, F.lit(grid)),
                    F.lit(0).cast("bigint"),
                    lambda acc, i: acc + bval(F.element_at(P, i)),
                ),
            ).otherwise(F.lit(0).cast("bigint"))

        return F.array(*[cell(c) for c in range(grid)])

    def out_bound(CS):
        tot = sum(
            [F.element_at(CS, c + 1) for c in range(1, grid)],
            F.element_at(CS, 1),
        )

        def k_b(c):
            return (
                F.when(nb > c, F.floor((nb - 1 - F.lit(c)) / F.lit(grid)) + 1)
                .otherwise(F.lit(0))
                .cast("bigint")
            )

        def build(T):
            bits = [
                F.when(
                    F.element_at(CS, c + 1) * nb > T * k_b(c),
                    F.lit(1).cast("bigint"),
                ).otherwise(F.lit(0).cast("bigint"))
                for c in range(grid)
            ]

            def band(k):
                terms = [
                    F.when(
                        bits[k * w + r] == 1, F.lit(1 << r).cast("bigint")
                    ).otherwise(F.lit(0).cast("bigint"))
                    for r in range(w)
                ]
                return sum(terms[1:], terms[0])

            return F.struct(
                sum(bits[1:], bits[0]).alias("popcount"),
                *[band(k).alias(f"b{k}") for k in range(4)],
            )

        return let_expr(tot, build)

    s = (
        df.filter(n >= 1)
        .select(F.col(id_col), n.alias("n_bytes"), pairs.alias("_pairs"))
        .select(
            id_col,
            "n_bytes",
            let_expr(F.col("_pairs"), cells_expr).alias("_cells"),
        )
    )
    s2 = s.select(
        id_col, "n_bytes", let_expr(F.col("_cells"), out_bound).alias("_s")
    )
    return s2.select(
        id_col,
        "n_bytes",
        F.col("_s.popcount").alias("popcount"),
        *[F.col(f"_s.b{k}").alias(f"b{k}") for k in range(4)],
    )


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from file_appender_spark.operators.imagehash import ahash_wide
    from file_appender_spark.operators.neardup_ingest import (
        _minhash_sig_frame,
        _minhash_sig_frame_exploded,
        _spread,
    )

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 2 == 1)
        .localCheckpoint(eager=True)
    )
    n = docs.count()
    out = {"probe": "r11_sigstage", "batch_docs": n}

    # -- warm-up: run each spelling once before any timing
    force(_minhash_sig_frame_exploded(docs, "doc_id", "text"))
    force(_minhash_sig_frame(docs, "doc_id", "text"))

    # -- bit-equality pin (exceptAll both ways on full frames)
    cur = _minhash_sig_frame_exploded(docs, "doc_id", "text")
    fus = _minhash_sig_frame(docs, "doc_id", "text")
    d1 = cur.exceptAll(fus).count()
    d2 = fus.exceptAll(cur).count()
    out["text_bitequal"] = (d1 == 0 and d2 == 0)
    out["text_diff_rows"] = d1 + d2

    out["text_exploded_sec"], out["text_exploded_reps"] = medtime(
        lambda: force(_minhash_sig_frame_exploded(docs, "doc_id", "text"))
    )
    out["text_fused_sec"], out["text_fused_reps"] = medtime(
        lambda: force(_minhash_sig_frame(docs, "doc_id", "text"))
    )

    # -- image aHash stage on the bench's encoded-text payloads
    pay = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", F.encode("text", "UTF-8").alias("payload"))
        .filter(F.col("doc_id") % 2 == 1)
        .localCheckpoint(eager=True)
    )
    force(ahash_wide(_spread(pay), "doc_id", "payload"))
    force(ahash_wide_fused(_spread(pay), "doc_id", "payload"))
    cur_i = ahash_wide(_spread(pay), "doc_id", "payload")
    fus_i = ahash_wide_fused(_spread(pay), "doc_id", "payload")
    d1 = cur_i.exceptAll(fus_i).count()
    d2 = fus_i.exceptAll(cur_i).count()
    out["image_bitequal"] = (d1 == 0 and d2 == 0)
    out["image_diff_rows"] = d1 + d2
    out["image_exploded_sec"], out["image_exploded_reps"] = medtime(
        lambda: force(ahash_wide(_spread(pay), "doc_id", "payload"))
    )
    out["image_fused_rejected_sec"], out["image_fused_rejected_reps"] = medtime(
        lambda: force(ahash_wide_fused(_spread(pay), "doc_id", "payload"))
    )

    with open("/root/repo/SIGSTAGE_PROBE_r11.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
