#!/usr/bin/env python
"""Round-10 idle re-measure of `hll_rollup_rows_per_sec` (r9 verdict
task 4): the extra went 677k (r8) -> 297k/384k (r9 idle runs) on an
UNTOUCHED code path. Bench measures it once per run at a ~1-second
grain, where JVM warm-up and first-use codegen dominate — this probe
runs the identical computation N times in one session, reporting every
iteration, so warm-up and steady-state separate cleanly. If the
steady-state matches r8's level, the r9 reading was first-iteration
warm-up noise; if it stays low, bisect.

Output: HLL_IDLE_PROBE_r10.json; adjudication belongs in SCALING.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from file_appender_spark.session import get_spark  # noqa: E402
from file_appender_spark.sources.catalog import load_table  # noqa: E402

N_ITER = 6
SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from file_appender_spark.operators.sketches import hll_estimate, hll_rollup

    spark = get_spark(app_name="probe_hll_idle_r10")
    o = load_table(spark, SF_DIR, "orders")
    n_orders = o.count()
    rates = []
    for i in range(N_ITER):
        t0 = time.perf_counter()
        hll_estimate(hll_rollup(o, ["o_orderpriority"], "o_custkey"), []).collect()
        dt = time.perf_counter() - t0
        rates.append(int(n_orders / dt))
        print(f"# iter {i}: {rates[-1]} rows/s ({dt:.3f}s)", file=sys.stderr)
    out = {
        "probe": "r10_hll_rollup_idle",
        "sf_dir": SF_DIR,
        "n_orders": n_orders,
        "rows_per_sec_iters": rates,
        "steady_state_median_last4": sorted(rates[-4:])[1],
    }
    with open("/root/repo/HLL_IDLE_PROBE_r10.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
