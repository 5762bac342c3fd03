#!/usr/bin/env python
"""Round-10 instrumentation: where does the residual per-epoch
store-scan term (SCALE1000_PROBE_r9: ~1.6s per 1M store rows) go?

The r9 probe measured the TOTAL textdup epoch at 13.0s against a
5.2M-row store vs 5.0s against 5.2k rows. The epoch touches the
store four times (all shuffle-free broadcast-filter scans):

  s1  band histogram + candidate equi-join (_band_pairs hist side,
      reads id + b0..b3, stacks 4x, semi vs batch (band,sig) set)
  s2  payload fetch (_fetch_old_payload: broadcast candidates over a
      scan of id + mh)
  s3  identical-signature history slice (_identical_sig_dups:
      id + b0..b3 scan, semi vs batch sigs, collect_set fold)
  s4  own-stored override (_own_stored_override: id scan, semi vs
      batch ids)

This probe times each term in isolation at the 5.2M store, plus the
design candidates for round-10 task 1 (kill the linear term):

  v1  s1 with xxhash64(concat(band,sig)) long keys instead of the
      ~40-char concat_ws strings (decode + join cost of strings?)
  v2  one NARROW index-slice materialization (id + band-sig longs,
      semi vs batch set, localCheckpoint) that could replace s1+s3+s4
  v3  payload fetch bounded by a broadcast id-semi (what s2 becomes
      when candidates ride the index slice)

Output: BREAKDOWN_PROBE_r10.json (working evidence, feeds the layout
decision; final numbers go through the re-run x1000 probe).
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

N = 5_000_000


def timed(fn):
    t0 = time.time()
    r = fn()
    return round(time.time() - t0, 2), r


def main() -> None:
    spark = get_spark(app_name="probe_breakdown_r10")
    from file_appender_spark.operators.neardup_ingest import (
        _band_pairs,
        _bands_long,
        _minhash_sig_frame,
        stamp_store_params,
        textdup_ingest_batch,
    )

    def _identical_sig_dups(sigs, hist, id_col, sig_cols):
        # the r9 spelling this probe measured (module version is now
        # within-batch-only; the history half rides the fused scan)
        gmin = sigs.groupBy(*sig_cols).agg(F.min(id_col).alias("_bmin"))
        batch_sigs = F.broadcast(sigs.select(*sig_cols).distinct())
        hist_groups = (
            hist.select(id_col, *sig_cols)
            .join(batch_sigs, sig_cols, "semi")
            .groupBy(*sig_cols)
            .agg(F.collect_set(F.col(id_col)).alias("_stored_ids"))
        )
        base = (
            sigs.select(id_col, *sig_cols)
            .join(gmin, sig_cols)
            .join(hist_groups, sig_cols, "left")
        )
        own = F.col("_stored_ids").isNotNull() & F.array_contains(
            "_stored_ids", F.col(id_col)
        )
        dup = ~own & (
            (F.col(id_col) != F.col("_bmin")) | F.col("_stored_ids").isNotNull()
        )
        return base.filter(dup).select(id_col)

    # local copies of the r9 spellings this probe measured (the module
    # helpers were replaced by the fused r10 path this probe motivated)
    def _fetch_old_payload(cand, old_payload, capped):
        c = F.broadcast(cand) if capped else cand
        return c.join(old_payload, "old_id")

    def _own_stored_override(dup_ids, hist, sigs, id_col):
        own_stored = hist.select(id_col).join(
            F.broadcast(sigs.select(id_col).distinct()), id_col, "semi"
        )
        return dup_ids.join(F.broadcast(own_stored), id_col, "left_anti")

    corpus = "/tmp/spark_graft_r10brk_5m"
    t_corpus, _ = timed(lambda: materialize_with_neardups(spark, N, corpus))
    small = "/tmp/spark_graft_r10brk_5k"
    timed(lambda: materialize_with_neardups(spark, 5_000, small))

    store = "/tmp/spark_graft_r10brk_td"
    shutil.rmtree(store, ignore_errors=True)
    docs = spark.read.parquet(corpus + "/documents.parquet")
    t_seed, _ = timed(
        lambda: _minhash_sig_frame(docs, "doc_id", "text").write.parquet(store)
    )
    stamp_store_params(store, {"modality": "minhash", "n_slots": 16, "n_bands": 4})

    ep = (
        spark.read.parquet(small + "/documents.parquet")
        .filter(F.col("doc_id") < 4_000)
        .select((F.col("doc_id") + 20_000_000).alias("doc_id"), "text")
    )
    t_sigs, sigs = timed(
        lambda: _minhash_sig_frame(ep, "doc_id", "text").localCheckpoint(eager=True)
    )
    bands = _bands_long(sigs, 4, "doc_id")
    hist = spark.read.parquet(store)
    cap = 65

    out = {"probe": "r10_breakdown", "corpus_sec": t_corpus, "seed_sec": t_seed,
           "epoch_sig_sec": t_sigs, "store_rows": hist.count()}

    # s1: histogram + candidate join (the _band_pairs history path)
    def s1():
        return _band_pairs(
            bands, _bands_long(hist, 4, "doc_id"), "doc_id",
            within_batch=False, band_bucket_cap=cap,
        ).localCheckpoint(eager=True)

    out["s1_band_pairs_sec"], cand = timed(s1)
    out["s1_cand_rows"] = cand.count()

    # s2: payload fetch through the (checkpointed) candidate set
    def s2():
        return _fetch_old_payload(
            cand,
            hist.select(F.col("doc_id").alias("old_id"), F.col("mh").alias("mh_old")),
            capped=True,
        ).count()

    out["s2_payload_fetch_sec"], out["s2_rows"] = timed(s2)

    # s3: identical-signature history slice
    out["s3_identical_sig_sec"], _ = timed(
        lambda: _identical_sig_dups(
            sigs, hist, "doc_id", ["b0", "b1", "b2", "b3"]
        ).count()
    )

    # s4: own-stored override (empty dup set in, cost is the id scan)
    empty_dups = sigs.select("doc_id").limit(0)
    out["s4_own_stored_sec"], _ = timed(
        lambda: _own_stored_override(empty_dups, hist, sigs, "doc_id").count()
    )

    # v1: s1 with long keys — xxhash64 the (band, sig) pair both sides
    def longify(b):
        return b.select("doc_id", "band", F.xxhash64("band", "sig").alias("sigh"))

    def v1():
        nb = longify(bands)
        ob = longify(_bands_long(hist, 4, "doc_id"))
        touched = F.broadcast(nb.select("band", "sigh").distinct())
        ob = ob.join(touched, ["band", "sigh"], "semi")
        sized = ob.groupBy("band", "sigh").agg(F.count("*").alias("n"))
        hot = F.broadcast(sized.filter(F.col("n") > cap))
        ob = ob.join(hot, ["band", "sigh"], "left_anti")
        nb2 = nb.join(hot, ["band", "sigh"], "left_anti").alias("x")
        y = ob.select(F.col("doc_id").alias("_oid"), "band", "sigh").alias("y")
        return (
            nb2.join(
                y,
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.sigh") == F.col("y.sigh"))
                & (F.col("x.doc_id") != F.col("y._oid")),
            )
            .select(F.col("x.doc_id").alias("new_id"), F.col("y._oid").alias("old_id"))
            .distinct()
            .count()
        )

    out["v1_long_keys_sec"], out["v1_cand_rows"] = timed(v1)

    # v2: one narrow index-slice materialization (id + band long)
    def v2():
        ob = longify(_bands_long(hist, 4, "doc_id"))
        touched = F.broadcast(
            longify(bands).select("band", "sigh").distinct()
        )
        return ob.join(touched, ["band", "sigh"], "semi").localCheckpoint(eager=True)

    out["v2_index_slice_sec"], idx = timed(v2)
    out["v2_slice_rows"] = idx.count()

    # v3: payload fetch via broadcast id-semi (post-index design)
    old_ids = cand.select(F.col("old_id")).distinct()
    out["v3_payload_by_id_sec"], out["v3_rows"] = timed(
        lambda: hist.select("doc_id", "mh")
        .join(F.broadcast(old_ids.withColumnRenamed("old_id", "doc_id")), "doc_id", "semi")
        .count()
    )

    # full epoch for reference (store copy so the append is isolated)
    store2 = store + "_full"
    shutil.rmtree(store2, ignore_errors=True)
    shutil.copytree(store, store2)
    out["full_epoch_sec"], _ = timed(
        lambda: textdup_ingest_batch(spark, ep, store2).count()
    )
    shutil.rmtree(store2, ignore_errors=True)

    with open("/root/repo/BREAKDOWN_PROBE_r10.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
