#!/usr/bin/env python
"""Round-10 mini-batch index probe: the banded index sidecar's target
regime measured head-to-head — small (64-doc) epochs against a
5.2M-row textdup store, pruned (sidecar present, touched buckets <=
n_buckets/16) vs the fused wide scan (sidecar renamed away), warm,
two repetitions each.

Context (SCALING.md round-10): the first sidecar cut LOST 3-4x to the
wide scan at this scale — partition discovery over all 4096 bucket
dirs (12.5s measured) plus an early payload dropDuplicates shuffle.
After the fixes (path-targeted reads of only the touched dirs, dedup
after the candidate-bounded semi, gate at nb/16) this probe is the
committed record of where the crossover actually sits at test scale.

Output: MINIBATCH_INDEX_PROBE_r10.json.
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

STORE = "/tmp/spark_graft_r10x1000_td_5m"  # reuses the x1000 probe's store
SMALL = "/tmp/spark_graft_r10x1000_5k"
EPOCH_DOCS = 64


def main() -> None:
    spark = get_spark(app_name="probe_minibatch_index_r10")
    from file_appender_spark.operators.neardup_ingest import (
        _band_index_state,
        _minhash_sig_frame,
        _with_index_cols,
        compact_store,
        stamp_store_params,
        textdup_ingest_batch,
    )

    materialize_with_neardups(spark, 5_000, SMALL)
    if _band_index_state(STORE) is None:
        # (re)build the 5.2M store + sidecar if the x1000 probe's
        # artifacts are gone
        big = "/tmp/spark_graft_r10x1000_5m"
        materialize_with_neardups(spark, 5_000_000, big)
        shutil.rmtree(STORE, ignore_errors=True)
        docs = spark.read.parquet(big + "/documents.parquet")
        _with_index_cols(
            _minhash_sig_frame(docs, "doc_id", "text"), 4,
            [f"b{i}" for i in range(4)],
        ).write.parquet(STORE)
        stamp_store_params(
            STORE, {"modality": "minhash", "n_slots": 16, "n_bands": 4}
        )
        compact_store(spark, STORE, id_col="doc_id")

    def ep(off):
        return (
            spark.read.parquet(SMALL + "/documents.parquet")
            .filter(F.col("doc_id") < EPOCH_DOCS)
            .select((F.col("doc_id") + off).alias("doc_id"), "text")
        )

    def run(mode: str, offs: list[int]) -> list[float]:
        times = []
        for off in offs:
            t0 = time.perf_counter()
            textdup_ingest_batch(spark, ep(off), STORE).count()
            times.append(round(time.perf_counter() - t0, 2))
            print(f"# {mode} 64-epoch: {times[-1]}s", file=sys.stderr)
        return times

    # warm-up epoch first (session JIT/codegen), excluded
    run("warmup", [70_000_000])
    idx_times = run("indexed", [71_000_000, 72_000_000])
    idx_dir = os.path.join(STORE, "_BANDS_IDX")
    os.rename(idx_dir, idx_dir + "_OFF")
    try:
        wide_times = run("wide", [73_000_000, 74_000_000])
    finally:
        os.rename(idx_dir + "_OFF", idx_dir)
    out = {
        "probe": "r10_minibatch_index",
        "store_rows": 5_200_000,
        "epoch_docs": EPOCH_DOCS,
        "index_buckets": _band_index_state(STORE)["buckets"],
        "indexed_epoch_sec": idx_times,
        "wide_epoch_sec": wide_times,
        "speedup_mean": round(
            (sum(wide_times) / len(wide_times))
            / (sum(idx_times) / len(idx_times)),
            2,
        ),
    }
    with open("/root/repo/MINIBATCH_INDEX_PROBE_r10.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
