#!/usr/bin/env python
"""Scale probe for the weighted-Jaccard 100 TB paths on a realistic
Zipf vocabulary (r4 verdict task 2: q159's capped branch and ICWS
twin existed only as prose; probe both at 10x).

Corpus: probe_containment's recipe (n docs, ~20 slots, Zipf ranks
over a vocabulary that GROWS with the corpus — Heaps' law — so the
token-df distribution is stationary across scales), except twins here
are MULTISET-subset twins: every 50th doc gets a copy of its first
80% of token SLOTS (not distinct tokens), so the planted pair's
weighted Jaccard is exactly 16/20 = 0.8 — comfortably above the 0.5
probe threshold, and sensitive to tf handling (a set-Jaccard
implementation would score it differently).

Measured at n and 10n:
- wall ratio of the CAPPED weighted_jaccard_pairs (token_df_cap=100,
  target <= x5) + planted recall at both scales;
- wall ratio of the banded-ICWS twin at icws_params_for's POLICY
  banding for threshold 0.7 (planted pairs are J=0.8) + planted
  recall. The policy is load-bearing: the first r5 probe hand-picked
  r=2, whose J^2 random-pair band collisions flooded the verify join
  at 200k docs until it spilled the disk — r must grow with the
  corpus (the srp "bits ~ log n" lesson, weighted edition).

Output: one JSON line; paste into SCALING.md / WJACCARD_PROBE_r5.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from file_appender_spark.operators.wjaccard import (  # noqa: E402
    icws_neardup_pairs,
    icws_params_for,
    weighted_jaccard_pairs,
)
from file_appender_spark.session import get_spark  # noqa: E402

V_MIN = 20_000
SLOTS = 20
CAP = 100
PLANT_EVERY = 50
THRESHOLD = 0.5
ICWS_THRESHOLD = 0.7  # planted twins sit at J_w = 0.8
PLANT_OFFSET = 1_000_000_000


def corpus(spark, n: int):
    """n Zipf docs + multiset-subset twins (J_w exactly 0.8)."""
    V = max(V_MIN, n)
    base = spark.range(n)
    docs = base.select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.expr(
                f"transform(sequence(1, {SLOTS}), j -> concat('w', cast(least({V}, "
                f"greatest(1, floor(pow({V}.0, "
                f"(((xxhash64(id, j) % 1000003) + 1000003) % 1000003) / 1000003.0"
                f")))) as int)))"
            ),
            " ",
        ).alias("text"),
    )
    words = F.split("text", r"\s+")
    planted = docs.filter(F.col("doc_id") % PLANT_EVERY == 0).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
        F.array_join(F.slice(words, 1, SLOTS * 8 // 10), " ").alias("text"),
    )
    return docs.unionByName(planted), n // PLANT_EVERY


def run(spark, n: int, fn, tag: str) -> dict:
    docs, n_planted = corpus(spark, n)
    docs = docs.persist()
    docs.count()
    t0 = time.time()
    pairs = fn(docs)
    found = pairs.filter(
        (F.col("d2") >= PLANT_OFFSET) & (F.col("d1") == F.col("d2") - PLANT_OFFSET)
    ).count()
    n_pairs = pairs.count()
    wall = time.time() - t0
    docs.unpersist()
    return {
        "op": tag,
        "n_docs": n,
        "wall_sec": round(wall, 2),
        "pairs": n_pairs,
        "planted": n_planted,
        "planted_found": found,
        "recall": round(found / n_planted, 4),
    }


def main():
    spark = get_spark(app_name="wjaccard_probe")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000

    def capped(d):
        return weighted_jaccard_pairs(d, threshold=THRESHOLD, token_df_cap=CAP)

    def icws(d):
        n_docs = d.count()
        k, b = icws_params_for(n_docs, ICWS_THRESHOLD)
        print(f"# icws policy at n={n_docs}: {k} hashes x {b} bands "
              f"(r={k // b})", file=sys.stderr)
        return icws_neardup_pairs(
            d, threshold=ICWS_THRESHOLD, n_hashes=k, n_bands=b
        )

    out = {
        "probe": "wjaccard_zipf",
        "threshold": THRESHOLD,
        "icws_threshold": ICWS_THRESHOLD,
        "token_df_cap": CAP,
    }
    for tag, fn in (("wjaccard_capped", capped), ("icws_banded", icws)):
        small = run(spark, n, fn, tag)
        big = run(spark, n * 10, fn, tag)
        out[tag] = {
            "small": small,
            "big": big,
            "wall_ratio_10x": round(big["wall_sec"] / max(small["wall_sec"], 1e-9), 2),
        }
        print(f"# {tag}: {small['wall_sec']}s -> {big['wall_sec']}s "
              f"(x{out[tag]['wall_ratio_10x']}), recall {small['recall']} / "
              f"{big['recall']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
