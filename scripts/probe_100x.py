#!/usr/bin/env python
"""100x-evidence probe (r4 verdict task 6): MEASURED, not
extrapolated, wall-clock for the two flagship dedup paths at 100x the
sf0.1 data volume — the cheapest way to convert "designed for 100 TB"
into evidence.

1. EXACT DEDUP (q50's plan: sha256 hash-groupBy, min-id keep) over a
   DIVERSE Zipf corpus (probe_wjaccard's recipe — replicating the real
   table 100x would make every text a 100-way duplicate and measure
   output collapse, not the groupBy) at sf0.1-equivalent size (5k
   docs) and 100x (500k docs), plus 5% planted exact copies so the
   dedup genuinely collapses something.

2. SRP NEAR-DUP with POLICY banding (srp_params_for, threshold 0.95)
   over synthetic 64-dim embeddings at 2k (= sf0.1's embeddings table)
   and 200k (100x): base vectors are xxhash64-derived uniforms in
   [-1, 1] (mutually near-orthogonal in expectation at dim 64), every
   50th vector gets a planted near-copy (one coordinate nudged 1%) —
   the planted-dup recipe from SCALING.md round 2, at 100x.

Everything is generated INSIDE Spark (no driver loops), deterministic.
Output: one JSON line -> SCALE100_PROBE_r5.json; numbers belong in
SCALING.md's round-5 section.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from file_appender_spark.operators.similarity import (  # noqa: E402
    srp_neardup,
    srp_params_for,
)
from file_appender_spark.session import get_spark  # noqa: E402

SLOTS = 20
PLANT_OFFSET = 1_000_000_000
DIM = 64


def zipf_docs(spark, n: int):
    """Diverse Zipf docs + every 20th doc an EXACT copy."""
    V = max(20_000, n)
    docs = spark.range(n).select(
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
    copies = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"), "text"
    )
    return docs.unionByName(copies)


def synth_embeddings(spark, n: int):
    """n synthetic 64-dim vectors + every 50th gets a near-copy."""
    u = (
        "((((xxhash64(id, j) % 1000003) + 1000003) % 1000003)"
        " / 1000003.0 * 2.0 - 1.0)"
    )
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(f"transform(sequence(1, {DIM}), j -> cast({u} as double))").alias(
            "embedding"
        ),
    )
    near = base.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + PLANT_OFFSET).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> IF(i = 0, x * 1.01, x))"
        ).alias("embedding"),
    )
    return base.unionByName(near)


def dedup_probe(spark, n: int) -> dict:
    docs = zipf_docs(spark, n).persist()
    n_in = docs.count()
    t0 = time.time()
    out = (
        docs.withColumn("h", F.sha2("text", 256))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )
    n_groups = out.count()
    n_dups = out.filter(F.col("n_copies") > 1).count()
    wall = time.time() - t0
    docs.unpersist()
    # every planted copy must collapse (Zipf originals may collide too)
    assert n_dups >= n // 20, (n_dups, n // 20)
    return {
        "n_docs": n_in,
        "wall_sec": round(wall, 2),
        "groups": n_groups,
        "dup_groups": n_dups,
        "docs_per_sec": int(n_in / wall),
    }


def srp_probe(spark, n: int) -> dict:
    emb = synth_embeddings(spark, n).persist()
    n_in = emb.count()
    n_bits, n_bands = srp_params_for(n_in, threshold=0.95)
    t0 = time.time()
    pairs = srp_neardup(emb, threshold=0.95, n_bits=n_bits, n_bands=n_bands)
    found = pairs.filter(
        (F.col("id2") >= PLANT_OFFSET) & (F.col("id1") == F.col("id2") - PLANT_OFFSET)
    ).count()
    n_pairs = pairs.count()
    wall = time.time() - t0
    emb.unpersist()
    planted = n // 50
    return {
        "n_vecs": n_in,
        "n_bits": n_bits,
        "n_bands": n_bands,
        "wall_sec": round(wall, 2),
        "pairs": n_pairs,
        "planted": planted,
        "planted_found": found,
        "recall": round(found / planted, 4),
        "vecs_per_sec": int(n_in / wall),
    }


def synth_payloads(spark, n: int):
    """n 512-byte high-entropy payloads (md5-chain bytes — the
    realistic regime: payload >> grid, unlike document text whose
    ~110 structured bytes give the hash almost no entropy) + every
    20th an exact copy."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.unhex(
            F.expr(
                "array_join(transform(sequence(1, 32), "
                "j -> md5(concat(cast(id AS string), '-', cast(j AS string)))), '')"
            )
        ).alias("payload"),
    )
    copies = base.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"), "payload"
    )
    return base.unionByName(copies)


def ahash_probe(spark, n: int) -> dict:
    """Banded aHash near-dup with the corpus-scaled banding policy
    (ahash_params_for: band bits ~ log n — 4x16-bit bands saturate
    past ~65k items exactly like un-scaled SRP banding would)."""
    from file_appender_spark.operators.imagehash import (
        ahash_params_for,
        ahash_neardup_sized,
    )

    docs = synth_payloads(spark, n).persist()
    n_in = docs.count()
    grid = ahash_params_for(n_in)
    t0 = time.time()
    pairs = ahash_neardup_sized(docs, "doc_id", "payload", n_items=n_in, max_hamming=3)
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
    spark = get_spark(app_name="probe_100x")
    spark.range(1).count()
    out = {"probe": "flagship_100x", "factor": 100}
    d_small = dedup_probe(spark, 5_000)
    d_big = dedup_probe(spark, 500_000)
    out["exact_dedup"] = {
        "sf01_equiv": d_small,
        "x100": d_big,
        "wall_ratio_100x": round(d_big["wall_sec"] / max(d_small["wall_sec"], 1e-9), 2),
    }
    print(f"# exact_dedup: {d_small['wall_sec']}s -> {d_big['wall_sec']}s "
          f"(x{out['exact_dedup']['wall_ratio_100x']} at 100x data)", file=sys.stderr)
    s_small = srp_probe(spark, 2_000)
    s_big = srp_probe(spark, 200_000)
    out["srp_neardup_policy"] = {
        "sf01_equiv": s_small,
        "x100": s_big,
        "wall_ratio_100x": round(s_big["wall_sec"] / max(s_small["wall_sec"], 1e-9), 2),
    }
    print(f"# srp_neardup: {s_small['wall_sec']}s -> {s_big['wall_sec']}s "
          f"(x{out['srp_neardup_policy']['wall_ratio_100x']}), recall "
          f"{s_small['recall']} / {s_big['recall']}", file=sys.stderr)
    a_small = ahash_probe(spark, 5_000)
    a_big = ahash_probe(spark, 500_000)
    out["ahash_neardup"] = {
        "sf01_equiv": a_small,
        "x100": a_big,
        "wall_ratio_100x": round(a_big["wall_sec"] / max(a_small["wall_sec"], 1e-9), 2),
    }
    print(f"# ahash_neardup: {a_small['wall_sec']}s -> {a_big['wall_sec']}s "
          f"(x{out['ahash_neardup']['wall_ratio_100x']}), recall "
          f"{a_small['recall']} / {a_big['recall']}, pairs "
          f"{a_small['pairs']} -> {a_big['pairs']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
