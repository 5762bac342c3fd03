"""r12 cold-call probe for the shared-subtree persists: one fresh
JVM per invocation (argv[1] = persist-index CSV, '' = none), one
timed cold call per operator — exactly bench.py's methodology for
op_wjaccard_capped / op_containment_capped (corpus pinned, single
count). Prints one JSON line; scripts/run_tfpersist_cold.sh loops
arms x reps and aggregates into TFPERSIST_PROBE_r12.json.
"""
from __future__ import annotations

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame

from file_appender_spark.session import get_spark
from file_appender_spark.operators.containment import containment_pairs
from file_appender_spark.operators.wjaccard import weighted_jaccard_pairs
from scripts.probe_containment import corpus as z_corpus
from scripts.probe_wjaccard import corpus as wj_corpus

_REAL = DataFrame.persist
_state = {"allowed": frozenset(), "n": 0}


def _masked(self, *a, **k):
    _state["n"] += 1
    if _state["n"] in _state["allowed"]:
        return _REAL(self, *a, **k)
    return self


def main() -> None:
    allowed = frozenset(
        int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1 and sys.argv[1] else [])
    )
    spark = get_spark(app_name="probe_tfpersist_cold")
    spark.sparkContext.setLogLevel("ERROR")
    wdocs, _ = wj_corpus(spark, 20_000)
    wdocs = _REAL(wdocs); wdocs.count()
    zdocs, _ = z_corpus(spark, 20_000)
    zdocs = _REAL(zdocs); zdocs.count()

    out = {"arm": sorted(allowed)}
    for key, fn in (
        ("wj_sec", lambda: weighted_jaccard_pairs(
            wdocs, threshold=0.5, token_df_cap=100).count()),
        ("cont_sec", lambda: containment_pairs(
            zdocs, threshold=0.9, token_df_cap=100).count()),
    ):
        _state["allowed"] = allowed
        _state["n"] = 0
        DataFrame.persist = _masked  # type: ignore
        try:
            t0 = time.perf_counter()
            fn()
            out[key] = round(time.perf_counter() - t0, 3)
        finally:
            DataFrame.persist = _REAL
    print("PROBE_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
