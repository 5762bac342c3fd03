#!/usr/bin/env python
"""Round-8 text-ingest hot-bucket probe: measure what the sized
default (`band_bucket_cap="auto"`, ingest_band_bucket_cap_for) BUYS on
a long-lived text store accumulating a boilerplate template family —
the deployment the r7 verdict named as the likeliest degenerate case.

Setup: 10 sequential micro-batches, each 200 organic Zipf-ish docs +
200 NEW members of ONE template family (identical shingle sets ->
identical MinHash signatures -> one band bucket per band that grows by
200 incumbents every batch). Per-batch ingest wall is measured under
(a) the sized default and (b) `band_bucket_cap=None`.

Expected shape: with the guard, the family bucket exceeds the cap (65)
from batch 1 on, drops out of candidate generation, and per-batch wall
stays flat in store size; without it, the history join's candidate
volume on that one bucket grows ~200*batch_index per new member —
quadratic cumulative work. The probe reports per-batch seconds and the
candidate-volume proxy (admitted counts differ too: the guard ADMITS
family members — at-least-once, the documented trade — while None
suppresses them to the first-ever member).

Output: one JSON object -> TEXTCAP_PROBE_r8.json; numbers belong in
SCALING.md round-8.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from file_appender_spark.session import get_spark  # noqa: E402

N_BATCHES = 10
ORGANIC_PER_BATCH = 200
FAMILY_PER_BATCH = 200
TEMPLATE = " ".join(f"tmpl{w}" for w in range(40))


def batch_df(spark, b: int):
    import random

    rng = random.Random(1000 + b)
    rows = []
    base_id = b * 10_000
    for i in range(ORGANIC_PER_BATCH):
        n = rng.randint(20, 60)
        words = [f"w{rng.randint(0, 5000)}" for _ in range(n)]
        rows.append((base_id + i, " ".join(words)))
    for i in range(FAMILY_PER_BATCH):
        # distinct texts, identical shingle SET (template repeated —
        # every repetition adds only the same boundary shingles)
        rows.append(
            (base_id + 5_000 + i, " ".join([TEMPLATE] * (2 + (b * 200 + i) % 7)))
        )
    return spark.createDataFrame(rows, "doc_id long, text string")


def run_mode(spark, label: str, cap) -> dict:
    from file_appender_spark.operators.neardup_ingest import textdup_ingest_batch

    store = f"/tmp/spark_graft_textcap_{label}"
    shutil.rmtree(store, ignore_errors=True)
    per_batch = []
    admitted_total = 0
    for b in range(N_BATCHES):
        df = batch_df(spark, b)
        t0 = time.time()
        admitted = textdup_ingest_batch(
            spark, df, store, band_bucket_cap=cap
        )
        admitted_total += admitted.count()
        per_batch.append(round(time.time() - t0, 2))
        print(f"# {label} batch {b}: {per_batch[-1]}s", file=sys.stderr)
    return {
        "per_batch_sec": per_batch,
        "first3_mean_sec": round(sum(per_batch[:3]) / 3, 2),
        "last3_mean_sec": round(sum(per_batch[-3:]) / 3, 2),
        "growth_last3_over_first3": round(
            sum(per_batch[-3:]) / max(sum(per_batch[:3]), 1e-9), 2
        ),
        "admitted_total": admitted_total,
    }


def main() -> None:
    spark = get_spark(app_name="probe_textcap_r8")
    out = {
        "probe": "r8_text_ingest_hot_bucket_guard",
        "n_batches": N_BATCHES,
        "organic_per_batch": ORGANIC_PER_BATCH,
        "family_per_batch": FAMILY_PER_BATCH,
        "auto_cap": run_mode(spark, "auto", "auto"),
        "uncapped": run_mode(spark, "none", None),
    }
    out["wall_ratio_uncapped_over_auto_last3"] = round(
        out["uncapped"]["last3_mean_sec"]
        / max(out["auto_cap"]["last3_mean_sec"], 1e-9),
        2,
    )
    with open("/root/repo/TEXTCAP_PROBE_r8.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
