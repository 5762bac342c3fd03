#!/usr/bin/env python
"""Round-6 tranche-9 10x probe: the six new queries (q215-q220)
at sf0.1 vs the 10x replica, idle, fresh plans per timed run
(probe_r6.query_probe methodology).

Output: one JSON line -> SCALE_PROBE_r6.json `tranche9` key.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from file_appender_spark.session import get_spark  # noqa: E402

NEW = [
    "q215_mann_whitney",
    "q216_wilson_source_rank",
    "q217_source_overlap",
    "q218_kaplan_meier",
    "q219_cluster_size_histogram",
    "q220_session_dwell",
]


def main():
    from scripts import probe_r6 as p6
    from scripts import scale_probe as sp

    spark = get_spark(app_name="probe_r6d")
    sp.build_replica(spark)
    from file_appender_spark.queries import QUERIES

    # warm codegen at tiny sf for every probed plan shape
    for name in NEW:
        QUERIES[name].spark_fn(spark, "/root/testdata/sf0.001").collect()

    out = {"probe": "tranche9_10x", "factor": 10}
    for name in NEW:
        out[name] = p6.query_probe(spark, name)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
