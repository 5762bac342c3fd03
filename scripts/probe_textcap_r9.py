#!/usr/bin/env python
"""Round-8 text-ingest hot-bucket probe — the measurement that drove
the signature-equality shortcut (_identical_sig_dups).

Setup: 10 sequential micro-batches, each 200 organic Zipf-ish docs +
200 NEW members of ONE template family (identical shingle sets ->
identical MinHash signatures). Per-batch ingest wall + admitted
counts are measured under the sized default cap and under
band_bucket_cap=None.

What the FIRST run of this probe found (pre-shortcut): under the
default cap the family's band bucket was dropped from candidate
generation, so every family member was ADMITTED AND STORED — 4000
admitted vs 2001 uncapped, i.e. the sized default traded the
exact-duplicate class's dedup away for the cost bound, and the
stored bucket kept growing. The fix: identical-FULL-signature dups
are exact under the modality's own verifier (estimated Jaccard 1.0)
and are now suppressed by a signature-equality groupBy with no pair
join, before the capped band join runs.

What the probe pins POST-fix: capped and uncapped admit the SAME set
(2001 = 2000 organic + 1 family representative), per-batch wall is
flat in store size for both modes, and the store holds one family
row (the hot bucket never accumulates).

Output: one JSON object -> TEXTCAP_PROBE_r9.json; numbers belong in
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
    spark = get_spark(app_name="probe_textcap_r9")
    out = {
        "probe": "r9_text_ingest_hot_bucket_guard",
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
    with open("/root/repo/TEXTCAP_PROBE_r9.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
