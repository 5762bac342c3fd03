#!/usr/bin/env python
"""Follow-up to probe_minibatch_index_r12: FORCED-pruned epochs at
the sizes the shipped gate routed wide (128/256/1024 docs) on the
50M-row store, so the gate recalibration is fit to measured times on
both sides of the old crossover, not extrapolated.

Forcing: monkeypatch the gate to always-prune. Reuses the store the
main probe left behind (re-run that first if absent).

Output: merged into MINIBATCH_INDEX_PROBE_r12.json as
"forced_pruned_epoch_sec" per size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from file_appender_spark.session import get_spark  # noqa: E402

STORE = "/tmp/spark_graft_r12_td_50m"
SMALL = "/tmp/spark_graft_r12_5k"
OUT = "/root/repo/MINIBATCH_INDEX_PROBE_r12.json"


def main() -> None:
    spark = get_spark(app_name="probe_minibatch_forced_r12")
    spark.sparkContext.setLogLevel("ERROR")
    import file_appender_spark.operators.neardup_ingest as ni

    assert os.path.isdir(STORE), "run probe_minibatch_index_r12 first"
    small_docs = spark.read.parquet(SMALL + "/documents.parquet")

    def ep(off, n):
        return small_docs.filter(F.col("doc_id") < n).select(
            (F.col("doc_id") + off).alias("doc_id"), "text"
        )

    orig = ni._use_band_index
    ni._use_band_index = lambda state, n_touched: True
    out = json.load(open(OUT)) if os.path.exists(OUT) else {"epochs": {}}
    try:
        base = 2_000_000_000
        for n in (128, 256, 1024):
            times = []
            for off in (base, base + 1_000_000):
                t0 = time.perf_counter()
                ni.textdup_ingest_batch(spark, ep(off, n), STORE).count()
                times.append(round(time.perf_counter() - t0, 2))
                assert ni._LAST_HISTORY_PATH.get(STORE) == "pruned"
                print(f"# forced-pruned {n}-epoch: {times[-1]}s", file=sys.stderr)
            base += 2_000_000
            out["epochs"].setdefault(str(n), {})["forced_pruned_epoch_sec"] = times
    finally:
        ni._use_band_index = orig
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["epochs"]))


if __name__ == "__main__":
    main()
