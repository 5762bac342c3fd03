#!/usr/bin/env python
"""Round-9 100x-evidence probe — the per-epoch ingest cost AFTER the
O(batch) fix (r8 verdict task 1), plus the incremental cluster
refresh (task 4).

r8 measured the one remaining O(store) term: a 5k-doc pairstore
ingest epoch cost 3.70s against a 5k-doc store and 5.59s against a
500k-doc store (x1.51 for a x100 store), because the over-cap
histogram aggregated the full history band stack and the verify
payload was fetched through an O(store) dropDuplicates. Round 9
broadcast-semi-slices the history by the batch's (band, sig) set and
broadcasts the candidate set over a store scan. This probe re-runs
the same measurement (same corpus generator, same epoch) and adds:

- a TEXTDUP epoch (4k docs) against a 5k-row vs a 500k-row signature
  store (the dedup-store analog; store seeded directly from
  _minhash_sig_frame — exactly the rows ingest would have written);
- refresh_clusters on the big store after the epoch: the r9
  INCREMENTAL fold vs the forced FULL recompute (r8: full refresh
  13.4s at 500k docs and growing with pairs).

Output: one JSON object -> SCALE100_PROBE_r9.json; numbers belong in
SCALING.md round-9.
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
from scripts.probe_100x_r8 import materialize_with_neardups  # noqa: E402

BASE = 5_000
FACTOR = 100


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def new_epoch(spark, sf_dir: str, n: int, offset: int):
    return (
        spark.read.parquet(sf_dir + "/documents.parquet")
        .filter(F.col("doc_id") < n)
        .select(
            (F.col("doc_id") + offset).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
    )


def pairstore_rows(spark, small_dir: str, big_dir: str) -> dict:
    from file_appender_spark.operators.pairstore import (
        build_pair_graph,
        pairstore_ingest_batch,
        read_pairs,
        refresh_clusters,
    )

    out: dict = {}
    for label, d in (("small", small_dir), ("big", big_dir)):
        store = f"/tmp/spark_graft_r9_pairstore_{label}"
        shutil.rmtree(store, ignore_errors=True)
        docs = spark.read.parquet(d + "/documents.parquet")
        row = {"n_docs": docs.count()}
        row["build_once_sec"] = timed(
            lambda: build_pair_graph(spark, docs, store)
        )
        row["pairs"] = read_pairs(spark, store).count()
        epoch = new_epoch(spark, small_dir, BASE, 10_000_000)
        row["ingest_5k_epoch_sec"] = timed(
            lambda: pairstore_ingest_batch(spark, epoch, store, batch_id=1)
        )
        row["refresh_incremental_sec"] = timed(
            lambda: refresh_clusters(spark, store)  # auto -> incremental
        )
        row["refresh_full_sec"] = timed(
            lambda: refresh_clusters(spark, store, mode="full")
        )
        out[label] = row
        print(f"# pairstore {label}: {row}", file=sys.stderr)
    out["ingest_epoch_cost_ratio_100x_store"] = round(
        out["big"]["ingest_5k_epoch_sec"]
        / max(out["small"]["ingest_5k_epoch_sec"], 1e-9),
        2,
    )
    out["refresh_incremental_speedup_big"] = round(
        out["big"]["refresh_full_sec"]
        / max(out["big"]["refresh_incremental_sec"], 1e-9),
        2,
    )
    return out


def textdup_rows(spark, small_dir: str, big_dir: str) -> dict:
    """Seed each signature store directly from _minhash_sig_frame
    (the exact rows a prior ingest run would have appended), then
    time ONE 4k-doc epoch against each."""
    from file_appender_spark.operators.neardup_ingest import (
        _minhash_sig_frame,
        stamp_store_params,
        textdup_ingest_batch,
    )

    out: dict = {}
    for label, d in (("small", small_dir), ("big", big_dir)):
        store = f"/tmp/spark_graft_r9_textdup_{label}"
        shutil.rmtree(store, ignore_errors=True)
        docs = spark.read.parquet(d + "/documents.parquet")
        _minhash_sig_frame(docs, "doc_id", "text").write.parquet(store)
        stamp_store_params(
            store, {"modality": "minhash", "n_slots": 16, "n_bands": 4}
        )
        epoch = new_epoch(spark, small_dir, 4_000, 20_000_000)
        t = timed(lambda: textdup_ingest_batch(spark, epoch, store).count())
        out[label] = {"store_rows": docs.count(), "ingest_4k_epoch_sec": t}
        print(f"# textdup {label}: {out[label]}", file=sys.stderr)
    out["ingest_epoch_cost_ratio_100x_store"] = round(
        out["big"]["ingest_4k_epoch_sec"]
        / max(out["small"]["ingest_4k_epoch_sec"], 1e-9),
        2,
    )
    return out


def main() -> None:
    spark = get_spark(app_name="probe_100x_r9")
    small_dir = "/tmp/spark_graft_r9_small"
    big_dir = "/tmp/spark_graft_r9_big"
    materialize_with_neardups(spark, BASE, small_dir)
    materialize_with_neardups(spark, BASE * FACTOR, big_dir)

    out = {
        "probe": "r9_obatch_ingest_epochs",
        "base_docs": BASE,
        "factor": FACTOR,
        "pairstore": pairstore_rows(spark, small_dir, big_dir),
        "textdup": textdup_rows(spark, small_dir, big_dir),
        "r8_reference": {
            "pairstore_ingest_epoch_ratio_100x": 1.51,
            "pairstore_refresh_full_big_sec": 13.43,
        },
    }
    with open("/root/repo/SCALE100_PROBE_r9.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
