"""r13 interleaved cold-JVM A/B: full build_pair_graph and full
curate() at sf0.1, one timed cold call per JVM (the bench's shape),
with the Spark event log parsed for the JOB COUNT — the structural
evidence for the r13 action-count fusions (CC observe rounds, curate
observe write), which bench-level seconds on this host cannot resolve
below ~20% (r12 lesson). Invoked per (repo_root, task); a wrapper
interleaves arms. Prints one JSON line.

Usage: python scripts/probe_pcab_r13.py <repo_root> <pairstore|curate>
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

root = sys.argv[1]
task = sys.argv[2]
sys.path.insert(0, root)

from file_appender_spark.session import get_spark  # noqa: E402

evdir = tempfile.mkdtemp(prefix="pcab_ev_")
spark = get_spark(
    app_name=f"pcab_{task}",
    extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
        "spark.eventLog.compress": "false",
    },
)
from file_appender_spark.sources.catalog import load_table  # noqa: E402

docs = load_table(spark, "/root/testdata/sf0.1", "documents")
docs.count()  # warm listing only

td = tempfile.mkdtemp(prefix="pcab_")
t0 = time.perf_counter()
if task == "pairstore":
    from file_appender_spark.operators.pairstore import build_pair_graph

    build_pair_graph(spark, docs, td + "/store")
else:
    from file_appender_spark.curate import curate

    curate(spark, docs, td + "/out")
wall = round(time.perf_counter() - t0, 3)
t0 = time.perf_counter()
spark.range(100_000_000).selectExpr("sum(id) AS s").collect()
calib = round(time.perf_counter() - t0, 3)
spark.stop()  # flush the event log
n_jobs = 0
files = []
for r, _d, names in os.walk(evdir):
    files.extend(os.path.join(r, n) for n in names)
for p in files:
    try:
        with open(p) as fh:
            for line in fh:
                if '"Event":"SparkListenerJobStart"' in line:
                    n_jobs += 1
    except (UnicodeDecodeError, OSError):
        pass
shutil.rmtree(td, ignore_errors=True)
shutil.rmtree(evdir, ignore_errors=True)
print(json.dumps({"root": root, "task": task, "wall": wall,
                  "n_jobs": n_jobs, "calib": calib}))
