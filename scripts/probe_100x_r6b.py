#!/usr/bin/env python
"""Round-6 100x-evidence probe for the three text-marginal heavies of
tranches 8/9 — the queries whose shuffles carry corpus-sized token /
gram marginals and therefore deserve measured 100x rows, not just 10x:

- q212 Dunning G² keywords: groupBy(source, token) + token marginal.
- q214 n-gram novelty: distinct (bucket, gram) + per-gram min.
- q217 cross-source overlap: gram-hash self-join with fanout bounded
  by sources-per-gram.

Corpus: probe_containment's deterministic Zipf/Heaps generator (5k
docs = sf0.1-equivalent, 500k = 100x), materialized as documents
parquet dirs with synthetic source (doc_id % 20) and lang (% 5)
columns so the REGISTERED queries run unmodified. Output: one JSON
line -> SCALE100_PROBE_r6.json; numbers belong in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from file_appender_spark.session import get_spark  # noqa: E402
from scripts.probe_containment import corpus  # noqa: E402

BASE = 5_000
FACTOR = 100
QUERIES_PROBED = [
    "q212_dunning_keywords",
    "q214_ngram_novelty",
    "q217_source_overlap",
    # session-2 extension: the remaining corpus-marginal heavies
    "q228_burrows_delta",
    "q231_stopword_discovery",
    "q240_capture_recapture",
]


def materialize(spark, n: int, path: str) -> None:
    if os.path.exists(path + "/documents.parquet"):
        return
    docs, _ = corpus(spark, n)
    # every 7th doc gets a fixed boilerplate prefix (7 coprime with 20 sources -> all source pairs co-own boilerplate grams): cross-SOURCE
    # shared 8-grams, so q217's overlap join has real candidate volume
    # (without it the Zipf corpus shares no exact 8-gram across docs)
    boiler = " ".join(f"boiler{i}" for i in range(12)) + " "
    full = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.lit(boiler), F.col("text"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
        F.concat(F.lit("lang"), (F.col("doc_id") % 5).cast("string")).alias("lang"),
        F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string")).alias(
            "source"
        ),
    ).select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.length("text").cast("long").alias("n_chars"),
    )
    full.write.mode("overwrite").parquet(path + "/documents.parquet")


def main() -> None:
    from file_appender_spark.queries.registry import build_fresh

    spark = get_spark(app_name="probe_100x_r6b")
    small_dir = "/tmp/spark_graft_100x_small"
    big_dir = "/tmp/spark_graft_100x_big"
    materialize(spark, BASE, small_dir)
    materialize(spark, BASE * FACTOR, big_dir)

    out = {"probe": "tranche8_9_text_100x", "base_docs": BASE, "factor": FACTOR}
    for name in QUERIES_PROBED:
        # warm codegen
        build_fresh(spark, small_dir, name).collect()
        t0 = time.time()
        n_small = len(build_fresh(spark, small_dir, name).collect())
        small = time.time() - t0
        t0 = time.time()
        n_big = len(build_fresh(spark, big_dir, name).collect())
        big = time.time() - t0
        out[name] = {
            "small_sec": round(small, 2),
            "big_sec": round(big, 2),
            "ratio": round(big / small, 2),
            "rows_small": n_small,
            "rows_big": n_big,
        }
        print(
            f"# {name}: {small:.2f}s ({n_small} rows) -> {big:.2f}s "
            f"({n_big} rows) x{big / small:.2f}",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
