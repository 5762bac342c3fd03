#!/usr/bin/env python
"""Round-6 tranche-11 10x probe: the five new queries (q227-q231)
at sf0.1 vs the 10x replica, idle, fresh plans per timed run
(probe_r6.query_probe methodology).

Output: one JSON line -> SCALE_PROBE_r6.json `tranche11` key.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from file_appender_spark.session import get_spark  # noqa: E402

NEW = [
    "q227_markov_entropy",
    "q228_burrows_delta",
    "q229_transition_lift",
    "q230_session_basket",
    "q231_stopword_discovery",
]


def main():
    from scripts import probe_r6 as p6
    from scripts import scale_probe as sp

    spark = get_spark(app_name="probe_r6f")
    sp.build_replica(spark)
    from file_appender_spark.queries import QUERIES

    # warm codegen at tiny sf for every probed plan shape
    for name in NEW:
        QUERIES[name].spark_fn(spark, "/root/testdata/sf0.001").collect()

    out = {"probe": "tranche11_10x", "factor": 10}
    for name in NEW:
        out[name] = p6.query_probe(spark, name)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
