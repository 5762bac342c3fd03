#!/usr/bin/env python
"""Write plans/r13/<name>_{before|after}.txt — explain("formatted")
for every query/operator path round 13 touched. Run once in an
r12-close (16bb98d) worktree with SUFFIX=before OUT_DIR=<repo>/plans/r13,
once at HEAD with SUFFIX=after.

Captured:
  - q158_pq_encode: declared query riding operators/pq.pq_encode
    (r13: fixed-width frames dispatch to the vectorized mapInArrow
    pass; before = the generated-SQL struct-min fold projection).
  - q58_tfidf, q59_ngram_freq, q191_bigram_lm_score, q197_jsd_sources,
    q212_dunning_keywords, q231_stopword_discovery: declared queries
    whose corpusstats read_{token,source,bigram}_stats frames are now
    served by the memoized merged view (one lazily localCheckpoint'ed
    frame shared by every consumer; before = per-consumer
    parquet-union rebuild).
  - q116_dedup_clusters: rides connected_components (r13: convergence
    stat fused into the round-checkpoint job via Dataset.observe; the
    returned frame's plan shape documents that the OUTPUT lineage is
    unchanged — the win is fewer per-round actions, evidence
    PCBREAK/PCAB_r13).
  - corpusstats_token_stats_view (operator level): read_token_stats
    on a fresh store, the frame every consumer shares.
  - pq_encode_operator: the encode stage alone over the embedding
    table (the q158 kernel without the final cast/round projection).

The lean-ingest static-planning change (f437114) alters session confs
and job count per epoch, not a capturable frame plan — its evidence is
EPOCH_OVERHEAD_PROBE_r13.json. The curate observe fusion likewise
(PCAB_r13.json).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SUFFIX = os.environ.get("SUFFIX", "after")
OUT = os.environ.get("OUT_DIR", os.path.join(REPO, "plans", "r13"))
SF = "/root/testdata/sf0.1"


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    from pyspark.sql import functions as F

    from file_appender_spark.queries import QUERIES
    from file_appender_spark.session import get_spark
    from file_appender_spark.sources.catalog import load_table

    spark = get_spark(app_name="snapshot_r13_plans")

    def dump(name: str, df) -> None:
        path = os.path.join(OUT, f"{name}_{SUFFIX}.txt")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")

    only = os.environ.get("SNAP_ONLY", "").split(",") if os.environ.get(
        "SNAP_ONLY"
    ) else None

    for q in (
        "q158_pq_encode",
        "q58_tfidf",
        "q59_ngram_freq",
        "q191_bigram_lm_score",
        "q197_jsd_sources",
        "q212_dunning_keywords",
        "q231_stopword_discovery",
        "q116_dedup_clusters",
    ):
        if only and q not in only:
            continue
        dump(q, QUERIES[q].spark_fn(spark, SF))

    # pq encode stage, operator level (the q158 kernel)
    if not only or "pq_encode_operator" in only:
        from file_appender_spark.operators.pq import pq_encode, seed_codebook

        emb = load_table(spark, SF, "embeddings")
        v = emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        )
        codebook = seed_codebook(v, "e", 4, 16)
        dump(
            "pq_encode_operator",
            pq_encode(v, "e", codebook, keep_cols=["vec_id"]),
        )

    # corpusstats merged token view, operator level: build a small
    # store with two appends (so the before-plan shows the real
    # multi-file union) and dump what read_token_stats serves.
    if only and "corpusstats_token_stats_view" not in only:
        spark.stop()
        return
    from file_appender_spark.operators.corpusstats import (
        build_corpus_stats,
        corpusstats_ingest_batch,
        read_token_stats,
    )

    tmp = tempfile.mkdtemp(prefix="snap_csview_")
    try:
        docs = load_table(spark, SF, "documents").select(
            "doc_id", "text", "source"
        )
        build_corpus_stats(spark, docs.limit(400), tmp)
        corpusstats_ingest_batch(spark, docs.limit(800), tmp, 1)
        dump("corpusstats_token_stats_view", read_token_stats(spark, tmp))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
