#!/usr/bin/env python
"""Round-6 tranche-12 10x probe: the five new queries (q232-q236)
at sf0.1 vs the 10x replica, idle, fresh plans per timed run
(probe_r6.query_probe methodology).

Output: one JSON line -> SCALE_PROBE_r6.json `tranche12` key.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from file_appender_spark.session import get_spark  # noqa: E402

NEW = [
    "q232_centroid_confusion",
    "q233_silhouette",
    "q234_embedding_health",
    "q235_cluster_purity",
    "q236_degree_assortativity",
]


def main():
    from scripts import probe_r6 as p6
    from scripts import scale_probe as sp

    spark = get_spark(app_name="probe_r6g")
    sp.build_replica(spark)
    from file_appender_spark.queries import QUERIES

    # warm codegen at tiny sf for every probed plan shape
    for name in NEW:
        QUERIES[name].spark_fn(spark, "/root/testdata/sf0.001").collect()

    out = {"probe": "tranche12_10x", "factor": 10}
    for name in NEW:
        out[name] = p6.query_probe(spark, name)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
