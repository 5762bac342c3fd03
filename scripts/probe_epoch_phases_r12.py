#!/usr/bin/env python
"""Round-12: driver-side phase attribution for one bench-shaped
textdup epoch. Mirrors textdup_ingest_batch step by step with
timestamps around each DRIVER call (plan construction vs actions) to
locate the ~1.9s of no-job-running gaps EPOCH_OVERHEAD_PROBE_r12
found. Working evidence only — the shipped function is unchanged."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from file_appender_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="probe_epoch_phases_r12")
    from file_appender_spark.operators import neardup_ingest as NI
    from file_appender_spark.operators.neardup_ingest import (
        _band_pairs,
        _bands_hash_long,
        _check_store_params,
        _hist_dup_terms,
        _identical_sig_dups,
        _minhash_sig_frame,
        _modality_spec,
        _open_store,
        _resolve_ingest_cap,
        _store_has_data,
        _with_index_cols,
        textdup_ingest_batch,
    )
    from file_appender_spark.storefs import store_fs_for
    from file_appender_spark.queries.llm import _MH_PARAMS

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    td = tempfile.mkdtemp()
    marks: list[tuple[str, float]] = []

    def mark(label):
        marks.append((label, time.time()))

    try:
        store_dir0 = os.path.join(td, "store")
        textdup_ingest_batch(spark, half, store_dir0, threshold=0.5)
        # warm epoch (codegen): run the real function once more on a
        # copy so the stepped epoch below is the steady-state shape
        store_warm = os.path.join(td, "warm")
        shutil.copytree(store_dir0, store_warm)
        textdup_ingest_batch(spark, rest, store_warm, threshold=0.5)

        batch, id_col, text_col, threshold = rest, "doc_id", "text", 0.5
        mark("start")
        n_bands = len(_MH_PARAMS) // 4
        spec = _modality_spec(
            {"modality": "minhash", "n_slots": len(_MH_PARAMS), "n_bands": n_bands}
        )
        store_dir = _open_store(store_dir0)
        mark("open_store")
        _check_store_params(
            store_dir,
            {"modality": "minhash", "n_slots": len(_MH_PARAMS), "n_bands": n_bands},
        )
        mark("check_params")
        sig_plan = _with_index_cols(
            _minhash_sig_frame(batch, id_col, text_col), n_bands, spec["fh_cols"]
        )
        mark("sig_plan_built")
        sigs = NI._compact_scan(sig_plan.localCheckpoint(eager=True))
        mark("sig_checkpoint_action")
        batch_bands = _bands_hash_long(sigs, n_bands, id_col, spec["fh_cols"])
        cap = _resolve_ingest_cap("auto", 2, n_bands, None)
        store_exists = _store_has_data(store_dir)
        hist = spark.read.parquet(store_dir)
        mark("hist_read_plan")
        store_rows = store_fs_for(store_dir).parquet_rows(
            store_dir, stop_at=NI._EAGER_SLICE_MIN_STORE_ROWS
        )
        mark("footer_rows")
        est_jacc = (
            F.aggregate(
                F.zip_with("mh_new", "mh_old", lambda a, b: (a == b).cast("int")),
                F.lit(0),
                lambda s, x: s + x,
            ).cast("double")
            / F.size("mh_new")
        )
        mark("est_jacc_built")
        wb_pairs, hist_pairs, ident_pairs = NI._lean_dup_terms(
            spark, store_dir, hist, sigs, id_col, spec, cap
        )
        mark("lean_terms_built")
        new_pay = sigs.select(
            F.col(id_col).alias("new_id"), F.col("mh").alias("mh_new")
        )
        dup_ids = wb_pairs.filter(est_jacc >= threshold).select(
            F.col("new_id").alias(id_col)
        )
        hp = hist_pairs.join(new_pay, "new_id")
        dup_ids = dup_ids.unionByName(
            hp.filter(est_jacc >= threshold).select(F.col("new_id").alias(id_col))
        )
        conf = ident_pairs.join(new_pay, "new_id").filter(
            F.col("mh_new") == F.col("mh_old")
        )
        own_stored = conf.filter(F.col("old_id") == F.col("new_id")).select(
            F.col("new_id").alias(id_col)
        )
        dup_ids = dup_ids.unionByName(
            conf.filter(F.col("old_id") != F.col("new_id")).select(
                F.col("new_id").alias(id_col)
            )
        )
        sig_cols = [f"b{bi}" for bi in range(n_bands)]
        dup_ids = dup_ids.unionByName(_identical_sig_dups(sigs, id_col, sig_cols))
        dup_ids = dup_ids.join(F.broadcast(own_stored), id_col, "left_anti")
        admitted_plan = batch.join(dup_ids, id_col, "left_anti")
        mark("dup_plan_built")
        admitted = admitted_plan.localCheckpoint(eager=True)
        mark("admitted_action")
        admitted_sigs = sigs.join(admitted.select(id_col), id_col)
        admitted_sigs.write.mode("append").parquet(store_dir)
        mark("append_write")
        n = admitted.count()
        mark("caller_count")
        print(f"# admitted {n}", file=sys.stderr)
    finally:
        shutil.rmtree(td, ignore_errors=True)

    prev = None
    for label, t in marks:
        if prev is not None:
            print(f"{label:>24}: {t - prev:7.3f}s")
        prev = t
    total = marks[-1][1] - marks[0][1]
    print(f"{'TOTAL':>24}: {total:7.3f}s  ({int(2500/total)} docs/s)")


if __name__ == "__main__":
    main()
