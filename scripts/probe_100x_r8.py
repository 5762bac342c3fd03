#!/usr/bin/env python
"""Round-8 100x-evidence probe (r7 verdict task 1): pair-store
amortization — the SCALE100_PROBE_r7 corpusstats format applied to
operators/pairstore.py.

Corpus: the deterministic Zipf/Heaps corpus of the r6b/r7 probes with
PLANTED near-duplicates — every doc_id % 10 == 1 is replaced by a
twin of its doc_id-1 neighbor (same text + a 3-word tail), so the
q52 pair graph holds ~n/10 verified pairs and ~n/10 two-member
clusters at every scale: pair volume scales linearly with the corpus,
the regime the store exists for.

Measured at 5k and 500k docs:

1. build_pair_graph once (LSH + exact verify + CC, the amortized
   prefix ten consumers re-run today);
2. the three rewired consumers (q116 / q213+auto-cap / q245) FROM
   THE STORE vs their recompute-the-LSH default spellings. Methodology
   note: the recompute spellings run AFTER the store path and share
   q52's internal shingle persist between themselves, so the measured
   recompute cost is a FLOOR — the amortization win is understated,
   never overstated;
3. one 5k-doc ingest epoch appended to each store — per-batch
   maintenance cost vs store size (the history side is touched only
   through the columnar band-signature join, so the big-store epoch
   must cost far less than a rebuild).

Output: one JSON object -> SCALE100_PROBE_r8.json; numbers belong in
SCALING.md round-8.
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


def materialize_with_neardups(spark, n: int, path: str) -> None:
    """The r6b Zipf corpus with every (10k+1)-id doc replaced by a
    near-twin of doc 10k: linear planted pair volume."""
    if os.path.exists(path + "/documents.parquet"):
        return
    tmp = path + "_zipfbase"
    materialize(spark, n, tmp)
    base = spark.read.parquet(tmp + "/documents.parquet")
    twins = base.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" nearduplicate tail marker")).alias(
            "text"
        ),
        "lang",
        "source",
        (F.length("text") + 26).cast("long").alias("n_chars"),
    )
    full = base.filter(F.col("doc_id") % 10 != 1).unionByName(twins)
    full.write.mode("overwrite").parquet(path + "/documents.parquet")
    shutil.rmtree(tmp, ignore_errors=True)


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def probe_scale(spark, n: int, sf_dir: str, store_dir: str) -> dict:
    from file_appender_spark.operators.pairstore import (
        build_pair_graph,
        pairstore_ingest_batch,
        read_cluster_assignment,
        read_pairs,
        refresh_clusters,
    )
    from file_appender_spark.queries.llm import q116_dedup_clusters
    from file_appender_spark.queries.tranche8 import q213_clustering_coefficient
    from file_appender_spark.queries.tranche17 import q245_effective_tokens

    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    out: dict = {"n_docs": n}
    out["build_once_sec"] = timed(
        lambda: build_pair_graph(spark, docs, store_dir)
    )
    out["pairs"] = read_pairs(spark, store_dir).count()
    out["clusters"] = (
        read_cluster_assignment(spark, store_dir)
        .select("cluster")
        .distinct()
        .count()
    )

    out["store_q116_sec"] = timed(
        lambda: q116_dedup_clusters(spark, sf_dir, graph_dir=store_dir).count()
    )
    out["store_q213_capped_sec"] = timed(
        lambda: q213_clustering_coefficient(
            spark, sf_dir, graph_dir=store_dir, max_degree="auto"
        ).count()
    )
    out["store_q245_sec"] = timed(
        lambda: q245_effective_tokens(spark, sf_dir, graph_dir=store_dir).count()
    )
    out["store_3consumers_sec"] = round(
        out["store_q116_sec"] + out["store_q213_capped_sec"] + out["store_q245_sec"],
        2,
    )

    # recompute spellings AFTER the store path (see module docstring:
    # shared q52 persist makes this a floor for the true cost)
    out["recompute_q116_sec"] = timed(
        lambda: q116_dedup_clusters(spark, sf_dir).count()
    )
    out["recompute_q213_capped_sec"] = timed(
        lambda: q213_clustering_coefficient(
            spark, sf_dir, max_degree="auto"
        ).count()
    )
    out["recompute_q245_sec"] = timed(
        lambda: q245_effective_tokens(spark, sf_dir).count()
    )
    out["recompute_3consumers_sec"] = round(
        out["recompute_q116_sec"]
        + out["recompute_q213_capped_sec"]
        + out["recompute_q245_sec"],
        2,
    )
    out["amortized_win_3consumers"] = round(
        out["recompute_3consumers_sec"] / max(out["store_3consumers_sec"], 1e-9),
        2,
    )

    # incremental maintenance: one 5k-doc epoch of NEW ids
    epoch = (
        spark.read.parquet(sf_dir + "/documents.parquet")
        .filter(F.col("doc_id") < BASE)
        .select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
    )
    out["ingest_5k_epoch_sec"] = timed(
        lambda: pairstore_ingest_batch(spark, epoch, store_dir, batch_id=1)
    )
    out["refresh_clusters_sec"] = timed(
        lambda: refresh_clusters(spark, store_dir)
    )
    return out


def main() -> None:
    spark = get_spark(app_name="probe_100x_r8")
    small_dir = "/tmp/spark_graft_r8_small"
    big_dir = "/tmp/spark_graft_r8_big"
    materialize_with_neardups(spark, BASE, small_dir)
    materialize_with_neardups(spark, BASE * FACTOR, big_dir)

    out = {
        "probe": "r8_pairstore_amortization",
        "base_docs": BASE,
        "factor": FACTOR,
        "pairstore": {},
    }
    for label, n, d in (("small", BASE, small_dir), ("big", BASE * FACTOR, big_dir)):
        store = f"/tmp/spark_graft_r8_store_{label}"
        shutil.rmtree(store, ignore_errors=True)
        out["pairstore"][label] = probe_scale(spark, n, d, store)
        print(f"# {label}: {out['pairstore'][label]}", file=sys.stderr)

    s, b = out["pairstore"]["small"], out["pairstore"]["big"]
    out["pairstore"]["build_wall_ratio_100x"] = round(
        b["build_once_sec"] / max(s["build_once_sec"], 1e-9), 2
    )
    out["pairstore"]["ingest_epoch_cost_ratio_100x_store"] = round(
        b["ingest_5k_epoch_sec"] / max(s["ingest_5k_epoch_sec"], 1e-9), 2
    )
    with open("/root/repo/SCALE100_PROBE_r8.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
