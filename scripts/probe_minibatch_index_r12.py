#!/usr/bin/env python
"""Round-12 (r11 verdict task 3): the banded-index sidecar probed at
a store size where pruning should DOMINATE — a 50M-row signature
store (10x the r11 probe's 5.2M), the regime the sidecar was built
for ("the pruned fraction at 500M+ rows is the story" was reasoning;
this makes >=50M measurement).

Store construction: 50M SYNTHETIC schema-v2 signature rows (mh/b/bh/
fh all derived consistently from xxhash64(id, slot) — the store only
ever serves band equi-joins and the payload-by-id mh fetch, so
synthetic signatures exercise the identical read paths) UNIONED with
the REAL signature rows of the 5k-doc Zipf corpus, so measured
epochs (re-ingesting offset copies of those docs) hit genuine banded
candidates, fh identical-signature matches, and the verify fetch.

Measures 64/128/256/1024-doc epochs pruned (sidecar live) vs wide
(sidecar renamed away), 2 reps each, plus the gate's decision at
each size — verifying the byte-derived gate's "conservative at
larger stores" claim with data.

Output: MINIBATCH_INDEX_PROBE_r12.json
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

N_STORE = 50_000_000
STORE = "/tmp/spark_graft_r12_td_50m"
SMALL = "/tmp/spark_graft_r12_5k"


def main() -> None:
    spark = get_spark(app_name="probe_minibatch_index_r12")
    spark.sparkContext.setLogLevel("ERROR")
    from file_appender_spark.operators.neardup_ingest import (
        _INDEX_DIR,
        _LAST_HISTORY_PATH,
        _band_index_state,
        _minhash_sig_frame,
        _use_band_index,
        _with_index_cols,
        build_band_index,
        stamp_store_params,
        textdup_ingest_batch,
    )
    from file_appender_spark.queries.llm import _MH_P

    materialize_with_neardups(spark, 5_000, SMALL)
    small_docs = spark.read.parquet(SMALL + "/documents.parquet")
    if not os.path.isdir(STORE):
        t0 = time.time()
        # synthetic v2 rows: 16 mh slots from xxhash64(id, slot) mod
        # _MH_P (the real slot range), bands/bh/fh derived exactly as
        # _with_index_cols does — schema-identical to a real store
        mh_cols = [
            f"pmod(xxhash64(id, {j}), {_MH_P}) AS mh{j}" for j in range(16)
        ]
        b_cols = [
            f"concat_ws(',', mh{4 * b}, mh{4 * b + 1}, mh{4 * b + 2}, "
            f"mh{4 * b + 3}) AS b{b}"
            for b in range(4)
        ]
        synth = (
            spark.range(10_000_000, 10_000_000 + N_STORE)
            .selectExpr("id", *mh_cols)
            .selectExpr(
                "id AS doc_id",
                "array(" + ", ".join(f"mh{j}" for j in range(16)) + ") AS mh",
                *b_cols,
            )
            .selectExpr(
                "doc_id", "mh", "b0", "b1", "b2", "b3",
                *[f"xxhash64({b}, b{b}) AS bh{b}" for b in range(4)],
                "xxhash64(b0, b1, b2, b3) AS fh",
            )
        )
        real = _with_index_cols(
            _minhash_sig_frame(small_docs, "doc_id", "text"),
            4,
            [f"b{i}" for i in range(4)],
        )
        synth.unionByName(real).repartition(64).write.parquet(STORE)
        stamp_store_params(
            STORE, {"modality": "minhash", "n_slots": 16, "n_bands": 4}
        )
        print(f"# store built in {time.time()-t0:.0f}s", file=sys.stderr)
        t0 = time.time()
        build_band_index(spark, STORE, "doc_id")
        print(f"# sidecar built in {time.time()-t0:.0f}s", file=sys.stderr)
    state = _band_index_state(STORE)

    def ep(off, n):
        return small_docs.filter(F.col("doc_id") < n).select(
            (F.col("doc_id") + off).alias("doc_id"), "text"
        )

    def run(mode, n, offs):
        times, path = [], "?"
        for off in offs:
            t0 = time.perf_counter()
            textdup_ingest_batch(spark, ep(off, n), STORE).count()
            times.append(round(time.perf_counter() - t0, 2))
            path = _LAST_HISTORY_PATH.get(STORE, "?")
            print(f"# {mode} {n}-epoch ({path}): {times[-1]}s", file=sys.stderr)
        return times, path

    out = {
        "probe": "r12_minibatch_index_50m",
        "store_rows": N_STORE + 5_000,
        "index_buckets": state["buckets"],
        "index_bytes": state.get("index_bytes"),
        "wide_narrow_bytes": state.get("wide_narrow_bytes"),
        "epochs": {},
    }
    run("warmup", 64, [900_000_000])
    base = 1_000_000_000
    for n in (64, 128, 256, 1024):
        # the gate's own verdict for this epoch size (bucket count of
        # the batch is <= n * 4 distinct buckets; use the worst case)
        out["epochs"].setdefault(str(n), {})["gate_would_prune"] = (
            _use_band_index(state, min(n * 4, state["buckets"]))
        )
        idx_times, idx_path = run("indexed", n, [base, base + 1_000_000])
        base += 2_000_000
        idx_dir = os.path.join(STORE, _INDEX_DIR)
        os.rename(idx_dir, idx_dir + "_OFF")
        try:
            wide_times, _ = run("wide", n, [base, base + 1_000_000])
        finally:
            os.rename(idx_dir + "_OFF", idx_dir)
        base += 2_000_000
        out["epochs"][str(n)].update(
            {
                "gate_path": idx_path,
                "indexed_epoch_sec": idx_times,
                "wide_epoch_sec": wide_times,
                "speedup_mean": round(
                    (sum(wide_times) / len(wide_times))
                    / (sum(idx_times) / len(idx_times)),
                    2,
                ),
            }
        )
    with open("/root/repo/MINIBATCH_INDEX_PROBE_r12.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
