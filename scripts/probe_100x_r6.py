#!/usr/bin/env python
"""Round-6 100x-evidence probe (r5 verdict task 6): measured 100x
rows for the two text-mining heavies that had 10x evidence only —

1. DIRECTED CONTAINMENT (q129's capped scale path,
   operators/containment.py): probe_containment's Zipf corpus with
   Heaps-law vocabulary growth and planted 80%-subset twins, at the
   sf0.1-equivalent size (5k docs) and 100x (500k docs), fixed
   token_df_cap — the production pattern whose candidate volume is
   linear in corpus size. Reports wall ratio AND planted recall at
   both scales (the honest cost of the cap).

2. q153 DUPLICATED 8-GRAM SPANS (Lee et al., arXiv:2107.06499's
   exact-substring signal): the same diverse Zipf corpus with every
   20th doc an exact copy, so each copy's every shingle is shared.
   The operator is the position-hash groupBy + equi-join back (no
   pair explosion); "recall" here is the fraction of planted copies
   whose report says dup_frac == 1.0 (every span flagged).

Everything is generated INSIDE Spark, deterministic (xxhash64-derived
Zipf ranks). Output: one JSON line -> SCALE100_PROBE_r6.json;
numbers belong in SCALING.md's round-6 section.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from file_appender_spark.operators.containment import containment_pairs  # noqa: E402
from file_appender_spark.queries.llm import _WS  # noqa: E402
from file_appender_spark.queries.mining import _NGRAM_K, _dup_share_report  # noqa: E402
from file_appender_spark.operators.textstats import ngrams  # noqa: E402
from file_appender_spark.session import get_spark  # noqa: E402
from scripts.probe_containment import CAP, THRESHOLD, corpus  # noqa: E402

PLANT_OFFSET = 1_000_000_000
SLOTS = 20


def containment_probe(spark, n: int) -> dict:
    docs, n_planted = corpus(spark, n)
    docs = docs.persist()
    n_in = docs.count()
    t0 = time.time()
    pairs = containment_pairs(docs, threshold=THRESHOLD, token_df_cap=CAP)
    found = pairs.filter(
        (F.col("d_sub") >= PLANT_OFFSET)
        & (F.col("d_super") == F.col("d_sub") - PLANT_OFFSET)
    ).count()
    n_pairs = pairs.count()
    wall = time.time() - t0
    docs.unpersist()
    return {
        "n_docs": n_in,
        "wall_sec": round(wall, 2),
        "pairs": n_pairs,
        "planted": n_planted,
        "planted_found": found,
        "recall": round(found / n_planted, 4),
        "docs_per_sec": int(n_in / wall),
    }


def zipf_docs_with_copies(spark, n: int):
    """probe_100x's exact-dedup corpus: diverse Zipf docs, every 20th
    an exact copy — for span dedup every shingle of a copy is shared,
    so the planted ground truth is dup_frac == 1.0 on both members."""
    V = max(20_000, n)
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.expr(
                f"transform(sequence(1, {SLOTS}), j -> concat('w', cast(least({V}, "
                f"greatest(1, floor(pow({V}.0, "
                f"(((xxhash64(id, j) % 1000003) + 1000003) % 1000003) / 1000003.0"
                f")))) as int)))"
            ),
            " ",
        ).alias("text"),
    )
    copies = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"), "text"
    )
    return docs.unionByName(copies), n // 20


def span_probe(spark, n: int) -> dict:
    docs, n_planted = zipf_docs_with_copies(spark, n)
    docs = docs.persist()
    n_in = docs.count()
    w = F.split("text", _WS)
    t0 = time.time()
    pos = docs.filter(F.size(w) >= _NGRAM_K).select(
        "doc_id",
        F.explode(F.transform(ngrams(w, _NGRAM_K), F.md5)).alias("h"),
    )
    per_doc = pos.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    rep = _dup_share_report(pos, per_doc, "n_shingles", "n_dup", "dup_frac")
    full_dup_planted = rep.filter(
        (F.col("doc_id") >= PLANT_OFFSET) & (F.col("dup_frac") == 1.0)
    ).count()
    n_docs_reported = rep.count()
    wall = time.time() - t0
    docs.unpersist()
    return {
        "n_docs": n_in,
        "reported": n_docs_reported,
        "wall_sec": round(wall, 2),
        "planted": n_planted,
        "planted_full_dup": full_dup_planted,
        "recall": round(full_dup_planted / n_planted, 4),
        "docs_per_sec": int(n_in / wall),
    }


def main():
    spark = get_spark(app_name="probe_100x_r6")
    spark.range(1).count()
    out = {"probe": "textmining_100x_r6", "factor": 100}

    c_small = containment_probe(spark, 5_000)
    c_big = containment_probe(spark, 500_000)
    out["containment_capped"] = {
        "token_df_cap": CAP,
        "threshold": THRESHOLD,
        "sf01_equiv": c_small,
        "x100": c_big,
        "wall_ratio_100x": round(
            c_big["wall_sec"] / max(c_small["wall_sec"], 1e-9), 2
        ),
    }
    print(
        f"# containment: {c_small['wall_sec']}s -> {c_big['wall_sec']}s "
        f"(x{out['containment_capped']['wall_ratio_100x']}), recall "
        f"{c_small['recall']} / {c_big['recall']}",
        file=sys.stderr,
    )

    s_small = span_probe(spark, 5_000)
    s_big = span_probe(spark, 500_000)
    out["dup_ngram_spans"] = {
        "sf01_equiv": s_small,
        "x100": s_big,
        "wall_ratio_100x": round(
            s_big["wall_sec"] / max(s_small["wall_sec"], 1e-9), 2
        ),
    }
    print(
        f"# dup_spans: {s_small['wall_sec']}s -> {s_big['wall_sec']}s "
        f"(x{out['dup_ngram_spans']['wall_ratio_100x']}), recall "
        f"{s_small['recall']} / {s_big['recall']}",
        file=sys.stderr,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
