#!/usr/bin/env python
"""Round-6 tranche 10x probe: the ten new queries (q187-q196) at
sf0.1 vs the 10x replica, idle, fresh plans per timed run
(probe_r6.query_probe's methodology — memoized DataFrames reuse
shuffle stages and time ~0 on repeat collects).

Output: one JSON line -> SCALE_PROBE_r6.json material.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from file_appender_spark.session import get_spark  # noqa: E402

NEW = [
    "q187_volume_shipping",
    "q188_market_share",
    "q189_product_profit",
    "q190_customer_distribution",
    "q191_bigram_lm_score",
    "q192_gopher_rules",
    "q193_t_closeness",
    "q194_pareto_frontier",
    "q195_kll_error_contract",
    "q196_running_median",
]


def main():
    from scripts import probe_r6 as p6
    from scripts import scale_probe as sp

    spark = get_spark(app_name="probe_r6b")
    sp.build_replica(spark)
    from file_appender_spark.queries import QUERIES

    # warm codegen at tiny sf for every probed plan shape
    for name in NEW:
        QUERIES[name].spark_fn(spark, "/root/testdata/sf0.001").collect()

    out = {"probe": "round6_tranche_10x", "factor": 10}
    for name in NEW:
        out[name] = p6.query_probe(spark, name)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
