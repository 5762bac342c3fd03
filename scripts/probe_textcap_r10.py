#!/usr/bin/env python
"""Round-10 re-run of the text-ingest hot-bucket probe after the
schema-v2 / fused-epoch / lean-shape rewrite (r9 verdict tasks 1+2).

Identical workload to scripts/probe_textcap_r9.py (10 micro-batches,
200 organic + 200 template-family docs each, capped-auto vs
uncapped): the invariants to hold are (a) capped and uncapped admit
the SAME 2001-doc set — the identical-signature suppression now rides
the fh full-signature-hash matches instead of the dedicated history
slice — and (b) per-batch wall stays flat in store size; the level
should RECOVER from the r9 regression (r8: ~1251 docs/s; r9:
689-776) now that the extra per-epoch store passes are fused away.

Output: TEXTCAP_PROBE_r10.json; numbers belong in SCALING.md round-10.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from file_appender_spark.session import get_spark  # noqa: E402
from scripts.probe_textcap_r9 import (  # noqa: E402
    FAMILY_PER_BATCH,
    N_BATCHES,
    ORGANIC_PER_BATCH,
    run_mode,
)


def main() -> None:
    spark = get_spark(app_name="probe_textcap_r10")
    out = {
        "probe": "r10_text_ingest_hot_bucket_guard",
        "n_batches": N_BATCHES,
        "organic_per_batch": ORGANIC_PER_BATCH,
        "family_per_batch": FAMILY_PER_BATCH,
        "auto_cap": run_mode(spark, "auto", "auto"),
        "uncapped": run_mode(spark, "none", None),
    }
    out["wall_ratio_uncapped_over_auto_last3"] = round(
        out["uncapped"]["last3_mean_sec"]
        / max(out["auto_cap"]["last3_mean_sec"], 1e-9),
        2,
    )
    with open("/root/repo/TEXTCAP_PROBE_r10.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
