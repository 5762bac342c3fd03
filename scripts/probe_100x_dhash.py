#!/usr/bin/env python
"""100x probe for the dHash near-dup modality (round 6): probe_100x's
aHash protocol verbatim — synthetic 512-byte high-entropy payloads,
every 20th an exact copy, corpus-scaled banding (ahash_params_for is
shared by both hashes) — but through dhash_neardup_sized, so the
gradient-hash mode carries the same measured 100x row the other four
dedup modalities have. Run AFTER the q184 map-hoist fix.

Output: one JSON line -> SCALE100_PROBE_r6.json material.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from file_appender_spark.session import get_spark  # noqa: E402
from scripts.probe_100x import PLANT_OFFSET, synth_payloads  # noqa: E402


def dhash_probe(spark, n: int) -> dict:
    from file_appender_spark.operators.imagehash import (
        ahash_params_for,
        dhash_neardup_sized,
    )

    docs = synth_payloads(spark, n).persist()
    n_in = docs.count()
    grid = ahash_params_for(n_in)
    t0 = time.time()
    pairs = dhash_neardup_sized(
        docs, "doc_id", "payload", n_items=n_in, max_hamming=3
    )
    found = pairs.filter(
        (F.col("d2") >= PLANT_OFFSET) & (F.col("d1") == F.col("d2") - PLANT_OFFSET)
    ).count()
    n_pairs = pairs.count()
    wall = time.time() - t0
    docs.unpersist()
    planted = n // 20
    return {
        "n_docs": n_in,
        "grid_bits": grid,
        "wall_sec": round(wall, 2),
        "pairs": n_pairs,
        "planted": planted,
        "planted_found": found,
        "recall": round(found / planted, 4),
        "docs_per_sec": int(n_in / wall),
    }


def main():
    spark = get_spark(app_name="probe_100x_dhash")
    spark.range(1).count()
    small = dhash_probe(spark, 5_000)
    big = dhash_probe(spark, 500_000)
    out = {
        "probe": "dhash_100x_r6",
        "factor": 100,
        "sf01_equiv": small,
        "x100": big,
        "wall_ratio_100x": round(big["wall_sec"] / max(small["wall_sec"], 1e-9), 2),
    }
    print(
        f"# dhash_neardup: {small['wall_sec']}s -> {big['wall_sec']}s "
        f"(x{out['wall_ratio_100x']}), recall {small['recall']} / {big['recall']}, "
        f"pairs {small['pairs']} -> {big['pairs']}",
        file=sys.stderr,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
