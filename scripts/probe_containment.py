#!/usr/bin/env python
"""Scale probe for the capped containment join on a REALISTIC Zipf
vocabulary (the r3 probe skipped q129 because the driver corpus's
~30-word vocabulary makes every pair a near-dup — that measures
output materialization, not plan shape).

Corpus: n docs, ~20 token slots each, token rank r drawn with
P(r) ~ 1/r over a vocabulary of max(20000, n) words (inverse-CDF
r = V^u) — the vocabulary GROWS with the corpus (Heaps' law: real
corpora keep minting rare tokens), which keeps the token-df
distribution stationary across scales; a fixed vocabulary would
inflate every df 10x at 10x docs and measure that artifact instead
of the plan. All tokens derive from xxhash64(doc_id, slot) — fully
deterministic, generated inside Spark (no driver loops). Every 50th
doc gets a planted subset twin (80% of its distinct tokens) whose
containment is exactly 1.0.

Measured at n and 10n with a FIXED token_df_cap (the production
pattern: an absolute posting cap makes candidate volume <= cap *
total_postings, i.e. LINEAR in corpus size, while recall falls only
for documents made entirely of ubiquitous tokens):

- wall-clock ratio of the capped containment_pairs (target <= x5),
- planted-pair recall at BOTH scales (the honest cost of the cap).

Output: one JSON line; paste the numbers into SCALING.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from file_appender_spark.operators.containment import containment_pairs  # noqa: E402
from file_appender_spark.session import get_spark  # noqa: E402

V_MIN = 20_000  # vocab floor; actual vocab = max(V_MIN, n_docs)
SLOTS = 20
CAP = 100
PLANT_EVERY = 50
THRESHOLD = 0.9


def corpus(spark, n: int):
    V = max(V_MIN, n)  # Heaps-law vocab growth (see module docstring)
    base = spark.range(n)
    # inverse-CDF Zipf rank r = V^u with u uniform from xxhash64 —
    # built as ONE SQL expression (generated-SQL lesson from the SRP
    # rebuild: HOF lambdas via py4j cost driver time, expr() is ms)
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
    toks = F.array_distinct(F.split("text", r"\s+"))
    planted = (
        docs.filter(F.col("doc_id") % PLANT_EVERY == 0)
        .select(
            (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
            F.array_join(
                F.slice(
                    toks, 1, F.greatest(F.lit(3), (F.size(toks) * 8 / 10).cast("int"))
                ),
                " ",
            ).alias("text"),
        )
    )
    return docs.unionByName(planted), n // PLANT_EVERY


def run(spark, n: int) -> dict:
    docs, n_planted = corpus(spark, n)
    docs = docs.persist()
    docs.count()
    t0 = time.time()
    pairs = containment_pairs(docs, threshold=THRESHOLD, token_df_cap=CAP)
    found = (
        pairs.filter(
            (F.col("d_sub") >= 1_000_000_000)
            & (F.col("d_super") == F.col("d_sub") - 1_000_000_000)
        ).count()
    )
    n_pairs = pairs.count()
    wall = time.time() - t0
    docs.unpersist()
    return {
        "n_docs": n,
        "wall_sec": round(wall, 2),
        "pairs": n_pairs,
        "planted": n_planted,
        "planted_found": found,
        "recall": round(found / n_planted, 4),
    }


def main():
    spark = get_spark(app_name="containment_probe")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    small = run(spark, n)
    big = run(spark, n * 10)
    out = {
        "probe": "containment_capped_zipf",
        "vocab": f"max({V_MIN}, n_docs)",
        "slots": SLOTS,
        "token_df_cap": CAP,
        "threshold": THRESHOLD,
        "small": small,
        "big": big,
        "wall_ratio_10x": round(big["wall_sec"] / max(small["wall_sec"], 1e-9), 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
