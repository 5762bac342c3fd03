"""r13 (r12 verdict item 6): cluster-shape validation of the r12
materialize-vs-recompute adjudications at the driver's CPU extremes.

The capped wjaccard/containment 'sides' frame ships as a LAZY
localCheckpoint (TFPERSIST_PROBE_r12 rejected persists at local[32]:
recompute pipelines across idle cores while persists pay cache-write
serialization + a barrier). At 8 cores the idle-core argument
weakens, so the trade could invert. Arms, one fresh JVM per
invocation (argv: arm cpus), one timed cold call per operator at the
bench corpus shape:
  ckpt    — shipped (lazy localCheckpoint)
  persist — sides.persist() instead
  none    — no materialization (consumers re-derive the subtree)
Run under SPARK_GRAFT_CPUS={8,32}; aggregate with the wrapper loop.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

arm = sys.argv[1]

import file_appender_spark.operators.materialize as mat

_real = mat.materialize_frame
if arm == "persist":
    mat.materialize_frame = lambda df, *, eager=True, reliable=False: df.persist()
elif arm == "none":
    mat.materialize_frame = lambda df, *, eager=True, reliable=False: df

from file_appender_spark.operators.containment import containment_pairs
from file_appender_spark.operators.wjaccard import weighted_jaccard_pairs
from file_appender_spark.session import get_spark
from scripts.probe_containment import corpus as z_corpus
from scripts.probe_wjaccard import corpus as wj_corpus


def main() -> None:
    spark = get_spark(app_name="probe_sides_cpus_r13")
    spark.sparkContext.setLogLevel("ERROR")
    wdocs, _ = wj_corpus(spark, 20_000)
    wdocs = wdocs.persist(); wdocs.count()
    zdocs, _ = z_corpus(spark, 20_000)
    zdocs = zdocs.persist(); zdocs.count()
    out = {"arm": arm, "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32")}
    t0 = time.perf_counter()
    weighted_jaccard_pairs(wdocs, threshold=0.5, token_df_cap=100).count()
    out["wj_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    containment_pairs(zdocs, threshold=0.9, token_df_cap=100).count()
    out["cont_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    spark.range(100_000_000).selectExpr("sum(id)").collect()
    out["calib"] = round(time.perf_counter() - t0, 3)
    print("PROBE_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
