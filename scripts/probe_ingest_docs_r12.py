#!/usr/bin/env python
"""Round-12: stable ingest docs/s measurement — median of N timed
epochs per modality on fresh copies of one populated store, with the
bench calibration workload bracketing the runs so numbers can be
compared at matched host speed (the r8 idle-bench policy).

Usage: python scripts/probe_ingest_docs_r12.py [N]
Appends one JSON line per invocation to INGEST_DOCS_PROBE_r12.jsonl.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from file_appender_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def calib(spark) -> float:
    t0 = time.perf_counter()
    spark.range(100_000_000).selectExpr("sum(id)").collect()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark(app_name="probe_ingest_docs_r12")
    from file_appender_spark.operators.neardup_ingest import (
        imagedup_ingest_batch,
        textdup_ingest_batch,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    pay = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    out = {"sf_dir": SF_DIR, "n_runs": N, "calib_before": calib(spark)}
    for kind, frames, fn in [
        ("textdup", docs, lambda s, d, st: textdup_ingest_batch(s, d, st, threshold=0.5)),
        ("imagedup", pay, imagedup_ingest_batch),
    ]:
        half = frames.filter(F.col("doc_id") % 2 == 0)
        rest = frames.filter(F.col("doc_id") % 2 == 1)
        n_batch = rest.count()
        td = tempfile.mkdtemp()
        rates = []
        try:
            base = os.path.join(td, "base")
            fn(spark, half, base)  # populate once
            # one warm epoch (codegen) on a throwaway copy
            warm = os.path.join(td, "warm")
            shutil.copytree(base, warm)
            fn(spark, rest, warm).count()
            for i in range(N):
                st = os.path.join(td, f"run{i}")
                shutil.copytree(base, st)
                t0 = time.perf_counter()
                fn(spark, rest, st).count()
                rates.append(int(n_batch / (time.perf_counter() - t0)))
        finally:
            shutil.rmtree(td, ignore_errors=True)
        out[kind] = {"rates": rates, "median": statistics.median(rates)}
        print(f"# {kind}: {rates} median {out[kind]['median']}", file=sys.stderr)
    out["calib_after"] = calib(spark)
    with open("/root/repo/INGEST_DOCS_PROBE_r12.jsonl", "a") as fh:
        fh.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
