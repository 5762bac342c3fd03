#!/usr/bin/env python
"""Round-over-round bench comparison, normalized by the host-speed
calibration workload (`calib_jvm_range_sum_1e8_sec`, added in round
2): hosts differ across rounds, so raw per-query deltas conflate
engine changes with hardware. Normalized seconds = measured *
(reference_calib / this_round_calib), i.e. "what this round's number
would read on the reference host".

Usage: python scripts/bench_compare.py [BENCH_r2.json BENCH_r3.json ...]
(defaults to every BENCH_r*.json in the repo root, oldest first;
rounds without a calibration sample are shown raw and flagged).
"""

from __future__ import annotations

import glob
import json
import os
import sys


def main(argv: list[str]) -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = argv or sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    if len(paths) < 2:
        print("need at least two BENCH_r*.json files", file=sys.stderr)
        return 2
    rounds = []
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        # the driver wraps the bench's own JSON line under "parsed"
        if "parsed" in d and isinstance(d["parsed"], dict):
            d = d["parsed"]
        d["_name"] = os.path.basename(p)
        d["_calib"] = (d.get("extras") or {}).get("calib_jvm_range_sum_1e8_sec")
        rounds.append(d)
    ref = next((r["_calib"] for r in rounds if r["_calib"]), None)

    def norm(r, v):
        if v is None:
            return None
        if r["_calib"] and ref:
            return v * (ref / r["_calib"])
        return v

    names = sorted({q for r in rounds for q in r.get("queries", {})})
    hdr = ["query"] + [
        r["_name"].replace("BENCH_", "").replace(".json", "")
        + ("" if r["_calib"] else "(raw)")
        for r in rounds
    ]
    print("\t".join(hdr))
    for q in names:
        row = [q]
        for r in rounds:
            v = norm(r, r.get("queries", {}).get(q))
            row.append("-" if v is None else f"{v:.3f}")
        print("\t".join(row))
    row = ["TOTAL(shared)"]
    shared = [q for q in names if all(q in r.get("queries", {}) for r in rounds)]
    for r in rounds:
        tot = sum(norm(r, r["queries"][q]) for q in shared)
        row.append(f"{tot:.3f}")
    print("\t".join(row))
    print(f"# normalized to calib={ref}s; shared queries: {len(shared)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
