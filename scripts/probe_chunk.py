#!/usr/bin/env python
"""Run a slice of scale_probe.PROBES (plus, for the final chunk, the
operator probes) and append results as JSON lines to a partial file —
lets the full canonical probe run fit inside bounded shell timeouts;
merge the parts with probe_merge.py afterwards.

Usage: probe_chunk.py START END OUTFILE  (END=-1 means "to the end,
and also run the operator probes")."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts import scale_probe as sp  # noqa: E402


def main() -> None:
    start, end = int(sys.argv[1]), int(sys.argv[2])
    outfile = sys.argv[3]
    names = sp.PROBES[start:] if end < 0 else sp.PROBES[start:end]

    from file_appender_spark.queries import QUERIES
    from file_appender_spark.session import get_spark

    spark = get_spark(app_name=f"scale_probe_chunk_{start}")
    sp.build_replica(spark)
    QUERIES["q01_pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001").collect()

    results = {}
    with open(outfile, "a") as f:
        for name in names:
            t0 = time.perf_counter()
            QUERIES[name].spark_fn(spark, sp.SRC).collect()
            small = time.perf_counter() - t0
            t0 = time.perf_counter()
            QUERIES[name].spark_fn(spark, sp.DST).collect()
            big = time.perf_counter() - t0
            row = {
                "sf0.1_sec": round(small, 2),
                "sf1_sec": round(big, 2),
                "ratio": round(big / small, 1),
            }
            results[name] = row
            f.write(json.dumps({name: row}) + "\n")
            f.flush()
            print(f"# {name}: {small:.2f}s -> {big:.2f}s (x{big / small:.1f})",
                  file=sys.stderr)

        if end < 0:
            from pyspark.sql import functions as F

            from file_appender_spark.operators.containment import containment_pairs
            from file_appender_spark.operators.fuzzyjoin import fuzzy_self_join
            from file_appender_spark.operators.similarity import (
                ann_sign_ivf,
                srp_neardup,
            )
            from file_appender_spark.sources.catalog import load_table

            def op_probe(tag, fn):
                t0 = time.perf_counter()
                fn(sp.SRC).count()
                small = time.perf_counter() - t0
                t0 = time.perf_counter()
                fn(sp.DST).count()
                big = time.perf_counter() - t0
                row = {
                    "sf0.1_sec": round(small, 2),
                    "sf1_sec": round(big, 2),
                    "ratio": round(big / small, 1),
                }
                f.write(json.dumps({tag: row}) + "\n")
                f.flush()
                print(f"# {tag}: {small:.2f}s -> {big:.2f}s (x{big / small:.1f})",
                      file=sys.stderr)

            op_probe(
                "op_srp_neardup",
                lambda d: srp_neardup(
                    load_table(spark, d, "embeddings"),
                    threshold=0.95, n_bits=128, n_bands=8,
                ),
            )
            op_probe(
                "op_ann_sign_ivf",
                lambda d: ann_sign_ivf(
                    load_table(spark, d, "embeddings"),
                    load_table(spark, d, "embeddings")
                    .filter(F.col("vec_id") % 100 == 0)
                    .select(F.col("vec_id").alias("qid"), "embedding"),
                    k=10, target_cell_size=256,
                ),
            )
            op_probe(
                "op_fuzzy_blocked",
                lambda d: fuzzy_self_join(
                    load_table(spark, d, "documents").select(
                        F.col("doc_id").alias("id"),
                        F.concat(
                            F.lower(F.substring("text", 1, 24)),
                            F.lit("-"),
                            F.col("doc_id").cast("string"),
                        ).alias("nm"),
                    ),
                    "id", "nm", max_dist=2,
                ),
            )
            # the capped containment twin probes on its own Zipf
            # corpus (probe_containment.py) because the driver corpus
            # vocabulary is degenerate for df caps — recorded in
            # CONTAINMENT_PROBE_r4.json, not here


if __name__ == "__main__":
    main()
