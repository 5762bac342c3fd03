#!/usr/bin/env python
"""Round-11 per-table-manifest probe: the pair store's manifest layout
must not change epoch/maintenance COST, only swap mechanics — the
SCALING.md claim is "the epoch plans are unchanged — the x1000 probes'
numbers carry over", and this measures it instead of asserting it.

Drives the identical lifecycle against a CLASSIC and a MANIFEST pair
store on local disk (same sf0.1 corpus, same epoch split): build over
doc_id %% 10 < 8, two ingest epochs (deciles 8 and 9) each followed by
an incremental cluster refresh, one compaction, one clusters read.
Times each phase per layout, warm (one throwaway build first).
The manifest layout adds one tiny _CURRENT read per table-dir
resolution (driver-side metadata), so the expectation is parity within
host noise on every phase.

Output: MANIFEST_PROBE_r11.json.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from file_appender_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark(app_name="probe_manifest_r11")
    from file_appender_spark.operators.pairstore import (
        build_pair_graph,
        compact_pairstore,
        create_manifest_pairstore,
        pairstore_ingest_batch,
        read_cluster_assignment,
        refresh_clusters,
    )
    from file_appender_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs.persist().count()

    def drive(store: str, layout: str) -> dict:
        shutil.rmtree(store, ignore_errors=True)
        if layout == "manifest":
            create_manifest_pairstore(store)
        out: dict = {"layout": layout}
        t0 = time.monotonic()
        build_pair_graph(spark, docs.filter(F.col("doc_id") % 10 < 8), store)
        out["build_sec"] = round(time.monotonic() - t0, 3)
        epochs = []
        for i, decile in enumerate((8, 9)):
            t0 = time.monotonic()
            pairstore_ingest_batch(
                spark,
                docs.filter(F.col("doc_id") % 10 == decile),
                store,
                batch_id=i + 1,
                band_bucket_cap=None,
            )
            used = refresh_clusters(spark, store)
            epochs.append(round(time.monotonic() - t0, 3))
            assert used == "incremental", used
        out["epoch_plus_refresh_sec"] = epochs
        t0 = time.monotonic()
        compact_pairstore(spark, store)
        out["compact_sec"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        out["clusters_rows"] = read_cluster_assignment(spark, store).count()
        out["read_clusters_sec"] = round(time.monotonic() - t0, 3)
        return out

    # warm-up: one throwaway classic build (JVM/codegen/IO warm)
    drive("/tmp/spark_graft_manifest_probe_warm", "classic")

    runs = []
    for rep in range(2):
        for layout in ("classic", "manifest"):
            runs.append(
                drive(f"/tmp/spark_graft_manifest_probe_{layout}", layout)
                | {"rep": rep}
            )

    result = {"probe": "r11_pairstore_manifest_parity", "sf": 0.1, "runs": runs}
    with open("/root/repo/MANIFEST_PROBE_r11.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
