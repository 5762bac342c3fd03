#!/usr/bin/env python
"""Round-6 tranche-7/8 10x probe: the twelve new queries (q203-q214)
at sf0.1 vs the 10x replica, idle, fresh plans per timed run
(probe_r6.query_probe methodology).

Output: one JSON line -> SCALE_PROBE_r6.json `tranche7_tranche8` key.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from file_appender_spark.session import get_spark  # noqa: E402

NEW = [
    "q203_min_cost_supplier",
    "q204_important_stock",
    "q205_late_ship_priority",
    "q206_supplier_part_counts",
    "q207_excess_stock_suppliers",
    "q208_sole_late_supplier",
    "q209_activity_streaks",
    "q210_daily_acf",
    "q211_cusum_changepoint",
    "q212_dunning_keywords",
    "q213_clustering_coefficient",
    "q214_ngram_novelty",
]


def main():
    from scripts import probe_r6 as p6
    from scripts import scale_probe as sp

    spark = get_spark(app_name="probe_r6c")
    sp.build_replica(spark)
    from file_appender_spark.queries import QUERIES

    # warm codegen at tiny sf for every probed plan shape
    for name in NEW:
        QUERIES[name].spark_fn(spark, "/root/testdata/sf0.001").collect()

    out = {"probe": "tranche7_tranche8_10x", "factor": 10}
    for name in NEW:
        out[name] = p6.query_probe(spark, name)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
