#!/usr/bin/env python
"""Round-6 10x probe bundle, run IDLE (no concurrent Spark process —
the r4/r5 lesson that long-sweep tail pressure inflates late rows):

1. q161 / q162 re-measure (r5 verdict task 4): their sweep rows
   drifted to x7.8 / x7.3 vs adjudicated x3.9 / x3.8 bands; this run
   is the clean idle measurement, best-of-2 at each scale.
2. CDC chunking twins (task 3): q186's per-position-md5 oracle form
   vs operators/chunking.cdc_chunk_stats_rolling (O(1) buzhash) on
   the documents table at sf0.1 and the 10x replica — the rolling
   branch's ratio is the bounded row (target <= x3).
3. q182 blocking policy (task 5): candidate volume per input row
   under blocking_params_for-sized bucket widths must stay ~flat
   from 1x to 10x (vs the fixed width, where block population grows
   linearly with the corpus).

Output: one JSON line -> SCALE_PROBE_r6.json material.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from file_appender_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sf1"


def best_of(k, fn):
    best = None
    for _ in range(k):
        t0 = time.perf_counter()
        fn()
        w = time.perf_counter() - t0
        best = w if best is None else min(best, w)
    return best


def query_probe(spark, name, runs=2):
    """Each timed run rebuilds the plan (registry.build_fresh): the
    memoized DataFrame shares RDDs across actions, so a repeat
    collect reuses already-materialized shuffle map stages and times
    ~0 (measured 1.75s -> 0.05s on q161) — best-of over fresh plans
    measures real executions only."""
    from file_appender_spark.queries.registry import build_fresh

    small = best_of(runs, lambda: build_fresh(spark, SRC, name).collect())
    big = best_of(runs, lambda: build_fresh(spark, DST, name).collect())
    row = {
        "sf0.1_sec": round(small, 2),
        "sf1_sec": round(big, 2),
        "ratio": round(big / small, 1),
    }
    print(f"# {name}: {small:.2f}s -> {big:.2f}s (x{big / small:.1f})",
          file=sys.stderr)
    return row


def rolling_cdc_probe(spark, runs=2):
    from file_appender_spark.operators.chunking import cdc_chunk_stats_rolling
    from file_appender_spark.sources.catalog import load_table

    out = {}
    for tag, d in (("sf0.1", SRC), ("sf1", DST)):
        docs = load_table(spark, d, "documents")
        w = best_of(runs, lambda: cdc_chunk_stats_rolling(docs).collect())
        out[f"{tag}_sec"] = round(w, 2)
    out["ratio"] = round(out["sf1_sec"] / out["sf0.1_sec"], 1)
    print(f"# op_cdc_rolling: {out['sf0.1_sec']}s -> {out['sf1_sec']}s "
          f"(x{out['ratio']})", file=sys.stderr)
    return out


def _rl_candidates(spark, sf_dir, width):
    """q182's candidate-generation stage with a parametric bucket
    width (the overlapped two-key blocking on (nation, bucket))."""
    from file_appender_spark.sources.catalog import load_table

    c = load_table(spark, sf_dir, "customer")
    bal = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint")
    a = c.select(
        F.col("c_custkey").alias("a_key"),
        bal.alias("v"),
        F.col("c_nationkey").alias("nat"),
    )
    b = c.filter(F.col("c_custkey") % 3 == 0).select(
        (F.col("c_custkey") + 1_000_000_000).alias("b_key"),
        (bal + 1).alias("v"),
        F.col("c_nationkey").alias("nat"),
    )
    half = max(width // 2, 1)

    def blocks(df, key):
        return df.select(
            key,
            "nat",
            F.explode(
                F.array(
                    (F.col("v") / width).cast("bigint"),
                    ((F.col("v") + half) / width).cast("bigint"),
                )
            ).alias("blk"),
        )

    return (
        blocks(a, "a_key")
        .join(blocks(b, "b_key"), ["nat", "blk"])
        .select("a_key", "b_key")
        .distinct()
    )


def blocking_probe(spark):
    from file_appender_spark.operators.blocking import blocking_params_for
    from file_appender_spark.sources.catalog import load_table

    out = {}
    for tag, d in (("sf0.1", SRC), ("sf1", DST)):
        c = load_table(spark, d, "customer")
        n = c.count()
        stats = c.agg(
            (F.max("c_acctbal") - F.min("c_acctbal")).alias("rng")
        ).first()
        rng_cents = float(stats["rng"]) * 100
        p = blocking_params_for(
            n, rng_cents, n_coblock=25, target_block_size=64.0
        )
        t0 = time.perf_counter()
        n_cand = _rl_candidates(spark, d, p.width).count()
        wall = time.perf_counter() - t0
        fixed_cand = _rl_candidates(spark, d, 1000).count()
        out[tag] = {
            "n_rows": n,
            "policy_width": p.width,
            "expected_block": round(p.expected_block_size, 1),
            "candidates": n_cand,
            "cand_per_row": round(n_cand / n, 2),
            "wall_sec": round(wall, 2),
            "fixed1000_candidates": fixed_cand,
            "fixed1000_cand_per_row": round(fixed_cand / n, 2),
        }
        print(f"# blocking {tag}: n={n} width={p.width} cand/row="
              f"{out[tag]['cand_per_row']} (fixed-1000: "
              f"{out[tag]['fixed1000_cand_per_row']}) {wall:.2f}s",
              file=sys.stderr)
    out["cand_per_row_ratio"] = round(
        out["sf1"]["cand_per_row"] / max(out["sf0.1"]["cand_per_row"], 1e-9), 2
    )
    out["fixed_cand_per_row_ratio"] = round(
        out["sf1"]["fixed1000_cand_per_row"]
        / max(out["sf0.1"]["fixed1000_cand_per_row"], 1e-9),
        2,
    )
    out["wall_ratio"] = round(
        out["sf1"]["wall_sec"] / max(out["sf0.1"]["wall_sec"], 1e-9), 2
    )
    return out


def main():
    from scripts import scale_probe as sp

    spark = get_spark(app_name="probe_r6")
    sp.build_replica(spark)
    from file_appender_spark.queries import QUERIES

    QUERIES["q01_pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001").collect()

    out = {"probe": "round6_idle", "factor": 10}
    out["q161_cms_estimates"] = query_probe(spark, "q161_cms_estimates")
    out["q162_winnowing"] = query_probe(spark, "q162_winnowing")
    out["q186_cdc_chunking_md5"] = query_probe(spark, "q186_cdc_chunking", runs=1)
    out["op_cdc_rolling"] = rolling_cdc_probe(spark, runs=1)
    out["q182_blocking_policy"] = blocking_probe(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
