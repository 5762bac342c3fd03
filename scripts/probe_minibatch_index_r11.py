#!/usr/bin/env python
"""Round-11 mini-batch index probe: the ID-ONLY banded index sidecar
(r10 verdict task 2) + the byte-derived use gate (task 6), measured
against the same 5.2M-row textdup store as MINIBATCH_INDEX_PROBE_r10.

What changed since r10: index rows dropped their per-band payload copy
(4x footprint), payloads now come from the wide store via the
count-gated broadcast fetch, and the NB/16 gate constant was replaced
by estimated pruned-read bytes vs narrow-wide-scan bytes from the
build-time meta. Expectations from the verdict: the gate loosens
(index read volume fell ~4x) and the minute-level epoch keeps/extends
its win.

Measures 64-doc epochs (the declared regime) and 128/256-doc epochs
(where the old gate refused), indexed vs sidecar-renamed-away wide,
warm, two reps each. Output: MINIBATCH_INDEX_PROBE_r11.json.
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


def main() -> None:
    spark = get_spark(app_name="probe_minibatch_index_r11")
    from file_appender_spark.operators.neardup_ingest import (
        _INDEX_DIR,
        _LAST_HISTORY_PATH,
        _band_index_state,
        _minhash_sig_frame,
        _with_index_cols,
        build_band_index,
        compact_store,
        stamp_store_params,
        textdup_ingest_batch,
    )

    materialize_with_neardups(spark, 5_000, SMALL)
    if not os.path.isdir(STORE):
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
    state = _band_index_state(STORE)
    if state is None or state.get("version", 1) < 2:
        # rebuild the sidecar under the r11 id-only layout
        build_band_index(spark, STORE, "doc_id")
        state = _band_index_state(STORE)

    def ep(off, n):
        return (
            spark.read.parquet(SMALL + "/documents.parquet")
            .filter(F.col("doc_id") < n)
            .select((F.col("doc_id") + off).alias("doc_id"), "text")
        )

    def run(mode: str, n: int, offs: list[int]) -> tuple[list[float], str]:
        times, path = [], "?"
        for off in offs:
            t0 = time.perf_counter()
            textdup_ingest_batch(spark, ep(off, n), STORE).count()
            times.append(round(time.perf_counter() - t0, 2))
            path = _LAST_HISTORY_PATH.get(STORE, "?")
            print(f"# {mode} {n}-epoch ({path}): {times[-1]}s", file=sys.stderr)
        return times, path

    out = {
        "probe": "r11_minibatch_index",
        "store_rows": 5_200_000,
        "index_buckets": state["buckets"],
        "index_bytes": state.get("index_bytes"),
        "wide_narrow_bytes": state.get("wide_narrow_bytes"),
        "epochs": {},
    }
    run("warmup", 64, [60_000_000])
    base = 81_000_000
    for n in (64, 128, 256):
        idx_times, idx_path = run("indexed", n, [base, base + 1_000_000])
        base += 2_000_000
        idx_dir = os.path.join(STORE, _INDEX_DIR)
        os.rename(idx_dir, idx_dir + "_OFF")
        try:
            wide_times, _ = run("wide", n, [base, base + 1_000_000])
        finally:
            os.rename(idx_dir + "_OFF", idx_dir)
        base += 2_000_000
        out["epochs"][str(n)] = {
            "gate_path": idx_path,
            "indexed_epoch_sec": idx_times,
            "wide_epoch_sec": wide_times,
            "speedup_mean": round(
                (sum(wide_times) / len(wide_times))
                / (sum(idx_times) / len(idx_times)),
                2,
            ),
        }
    with open("/root/repo/MINIBATCH_INDEX_PROBE_r11.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
