"""r12 variant probe: WHICH shared-subtree persists pay for
themselves in the capped wjaccard/containment operators.

Each operator calls DataFrame.persist at three deterministic
plan-construction points (wjaccard: tf(1), ranked(2), occ(3);
containment: arr(1), ranked(2), arr64(3)). The probe masks persist
by call index, timing every interesting subset at the bench's cold
shape (cache cleared, corpus re-pinned, one timed count). Two reps
per subset, subsets visited round-robin so JVM warm-up spreads
evenly.
"""
from __future__ import annotations

import json
import os
import sys
import time

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
    spark = get_spark(app_name="probe_tfpersist_subsets")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    wdocs_raw, _ = wj_corpus(spark, 20_000)
    zdocs_raw, _ = z_corpus(spark, 20_000)

    subsets = {
        "none": frozenset(),
        "1": frozenset({1}),
        "12": frozenset({1, 2}),
        "13": frozenset({1, 3}),
        "23": frozenset({2, 3}),
        "123": frozenset({1, 2, 3}),
    }
    res = {
        "wj": {k: [] for k in subsets},
        "cont": {k: [] for k in subsets},
    }
    for rep in range(2):
        for name, allowed in subsets.items():
            spark.catalog.clearCache()
            wdocs = _REAL(wdocs_raw); wdocs.count()
            zdocs = _REAL(zdocs_raw); zdocs.count()
            for op, fn in (
                ("wj", lambda: weighted_jaccard_pairs(
                    wdocs, threshold=0.5, token_df_cap=100).count()),
                ("cont", lambda: containment_pairs(
                    zdocs, threshold=0.9, token_df_cap=100).count()),
            ):
                sc.setJobDescription(f"subset[{op}][{name}][rep{rep}]")
                _state["allowed"] = allowed
                _state["n"] = 0
                DataFrame.persist = _masked  # type: ignore
                try:
                    t0 = time.perf_counter()
                    fn()
                    res[op][name].append(round(time.perf_counter() - t0, 3))
                finally:
                    DataFrame.persist = _REAL
    out = {"probe": "r12_tfpersist_subsets", "docs": 20_000, **res}
    with open("TFPERSIST_SUBSETS_PROBE_r12.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
