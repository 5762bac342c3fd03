#!/usr/bin/env python
"""Round-7 100x-evidence probe (r6 verdict tasks 4 + 5):

1. THE SATURATED-LINEAR CLASS gets measured 100x rows instead of an
   inference: q192 (Gopher gate — zero-shuffle per-row expressions)
   and q161 (CMS — shuffle bounded by sketch size, per-row cell
   hashing) on the deterministic Zipf/Heaps corpus at 5k and 500k
   docs. The class's r6 adjudication was "linear per-row work
   partitions perfectly, fine at 100x" — this measures it: wall must
   track rows (ratio well under 100 on 32 cores because the small
   run can't saturate them; the honest metric is docs/s at 100x >=
   docs/s at 1x).

2. CORPUS-STATS AMORTIZATION (operators/corpusstats.py): build the
   materialized (source, token) tf/df table once at each scale, then
   answer q212 + q231 from the store vs their scan-everything
   spellings. The bench-sf corpus sits below the materialization
   crossover (620 distinct (source, token) pairs — store read
   overhead dominates); this measures where the crossover actually
   is. NOTE the generator's vocab grows LINEARLY with docs (V =
   max(20k, n)), the worst case for a stats table — real corpora are
   Heaps-sublinear, so the measured win is a floor.

q192 is forced with an aggregate over its computed columns (never a
500k-row collect — driver materialization would dominate the
measurement); q161's output is the Zipf head (bounded).

Output: one JSON object -> SCALE100_PROBE_r7.json; numbers belong in
SCALING.md round-7.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from file_appender_spark.session import get_spark  # noqa: E402
from scripts.probe_100x_r6b import materialize  # noqa: E402

BASE = 5_000
FACTOR = 100


def force_q192(spark, sf_dir: str) -> float:
    from file_appender_spark.queries.registry import build_fresh

    t0 = time.time()
    build_fresh(spark, sf_dir, "q192_gopher_rules").agg(
        F.sum("gopher_pass"),
        F.sum("n_stop_hits"),
        F.sum("mean_word_len"),
        F.sum("alpha_word_frac"),
        F.sum("hash_ratio"),
        F.sum("ellipsis_ratio"),
        F.sum("n_words"),
    ).collect()
    return time.time() - t0


def force_q161(spark, sf_dir: str) -> float:
    from file_appender_spark.queries.registry import build_fresh

    t0 = time.time()
    build_fresh(spark, sf_dir, "q161_cms_estimates").count()
    return time.time() - t0


def saturated_linear(spark, small_dir: str, big_dir: str) -> dict:
    out = {}
    for name, force in (("q192_gopher_rules", force_q192),
                        ("q161_cms_estimates", force_q161)):
        force(spark, small_dir)  # warm codegen
        small = force(spark, small_dir)
        big = force(spark, big_dir)
        out[name] = {
            "small_sec": round(small, 2),
            "big_sec": round(big, 2),
            "wall_ratio_100x": round(big / small, 2),
            "docs_per_sec_small": int(BASE / small),
            "docs_per_sec_big": int(BASE * FACTOR / big),
            "throughput_ratio": round((BASE * FACTOR / big) / (BASE / small), 2),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    return out


def corpusstats_amortization(spark, sf_dir: str, n_docs: int) -> dict:
    """Two consumer buckets, measured separately because their
    economics differ: TOKEN-marginal consumers (q212, q231) are pure
    store reads; BIGRAM consumers (q59, q191) compress worse (most
    bigrams are unique, so the stats table approaches stream size on
    a diverse corpus) and q191's per-doc scoring pass scans the
    corpus regardless — the store only removes its model-build
    scans. Reporting them pooled would hide both facts."""
    from file_appender_spark.operators.corpusstats import build_corpus_stats
    from file_appender_spark.queries.llm import q59_ngram_freq
    from file_appender_spark.queries.tranche6 import q191_bigram_lm_score
    from file_appender_spark.queries.tranche8 import q212_dunning_keywords
    from file_appender_spark.queries.tranche11 import q231_stopword_discovery
    from file_appender_spark.sources.catalog import load_table

    store = f"/tmp/spark_graft_cs_store_{n_docs}"
    shutil.rmtree(store, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents")
    t0 = time.time()
    build_corpus_stats(spark, docs, store)
    build = time.time() - t0
    out = {
        "n_docs": n_docs,
        "build_once_sec": round(build, 2),
        "token_stats_rows": spark.read.parquet(
            os.path.join(store, "token_stats")
        ).count(),
        "bigram_stats_rows": spark.read.parquet(
            os.path.join(store, "bigram_stats")
        ).count(),
    }
    for label, consumers in (
        ("token_consumers_q212_q231",
         (q212_dunning_keywords, q231_stopword_discovery)),
        ("bigram_consumers_q59_q191",
         (q59_ngram_freq, q191_bigram_lm_score)),
    ):
        t0 = time.time()
        for q in consumers:
            q(spark, sf_dir, stats_dir=store).count()
        via_store = time.time() - t0
        t0 = time.time()
        for q in consumers:
            q(spark, sf_dir).count()
        scan = time.time() - t0
        out[label] = {
            "from_store_sec": round(via_store, 2),
            "scan_sec": round(scan, 2),
            "store_speedup_x": round(scan / via_store, 2),
        }
    shutil.rmtree(store, ignore_errors=True)
    return out


def materialize_heaps(spark, n: int, path: str, tokens_per_doc: int = 100) -> None:
    """A REPRESENTATIVE text corpus for the stats-table question: web
    documents run hundreds of tokens, and vocabulary follows Heaps'
    law V = K * n^beta (K=30, beta=0.6 — standard English-corpus
    parameters), i.e. SUBLINEAR — unlike the containment generator's
    V = max(20k, n), which is the stats table's worst case. Zipf
    ranks inside the vocab exactly as scripts/probe_containment."""
    if os.path.exists(path + "/documents.parquet"):
        return
    V = max(1000, int(30 * n ** 0.6))
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.expr(
                f"transform(sequence(1, {tokens_per_doc}), j -> concat('w', "
                f"cast(least({V}, greatest(1, floor(pow({V}.0, "
                f"(((xxhash64(id, j) % 1000003) + 1000003) % 1000003) / 1000003.0"
                f")))) as int)))"
            ),
            " ",
        ).alias("text"),
        F.concat(F.lit("lang"), (F.col("id") % 5).cast("string")).alias("lang"),
        F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias("source"),
    )
    docs.select(
        "doc_id", "text", "lang", "source",
        F.length("text").cast("long").alias("n_chars"),
    ).write.mode("overwrite").parquet(path + "/documents.parquet")


def main() -> None:
    spark = get_spark(app_name="probe_100x_r7")
    small_dir = "/tmp/spark_graft_100x_small"
    big_dir = "/tmp/spark_graft_100x_big"
    materialize(spark, BASE, small_dir)
    materialize(spark, BASE * FACTOR, big_dir)
    heaps_small = "/tmp/spark_graft_100x_heaps_small"
    heaps_big = "/tmp/spark_graft_100x_heaps_big"
    materialize_heaps(spark, BASE, heaps_small)
    materialize_heaps(spark, BASE * FACTOR, heaps_big)
    out = {
        "probe": "r7_saturated_linear_and_corpusstats",
        "base_docs": BASE,
        "factor": FACTOR,
        "saturated_linear": saturated_linear(spark, small_dir, big_dir),
        "corpusstats_linear_vocab_worst_case": {
            "small": corpusstats_amortization(spark, small_dir, BASE),
            "x100": corpusstats_amortization(spark, big_dir, BASE * FACTOR),
        },
        "corpusstats_heaps_100tok": {
            "small": corpusstats_amortization(spark, heaps_small, BASE),
            "x100": corpusstats_amortization(spark, heaps_big, BASE * FACTOR),
        },
    }
    print(json.dumps(out))
    with open("/root/repo/SCALE100_PROBE_r7.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
