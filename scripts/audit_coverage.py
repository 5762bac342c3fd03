#!/usr/bin/env python
"""Docs-vs-code audit: every registered query must appear in
COVERAGE.md, every qNN mentioned in COVERAGE.md must exist in the
registry, and every query must have an oracle unless explicitly
rows-only. Exit 1 on drift — run before ending a work round.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# rows-only queries (no oracle) must be deliberate, listed here
ROWS_ONLY_ALLOWED: set[str] = set()  # r5: q66 gained an error-contract oracle


def main() -> int:
    from file_appender_spark.queries import QUERIES

    cov = open(os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")).read()
    # COVERAGE rows may cite short ids ("q05", "string q30"); compare
    # by the qNN[letter] id, not the full slug
    mentioned = {m.group(1) for m in re.finditer(r"\b(q\d+[a-z]?)(_[a-z0-9_]+)?\b", cov)}
    registered = {name.split("_", 1)[0]: name for name in QUERIES}

    problems = []
    for qid in sorted(set(registered) - mentioned):
        problems.append(f"registered but not in COVERAGE.md: {registered[qid]}")
    for qid in sorted(mentioned - set(registered)):
        problems.append(f"in COVERAGE.md but not registered: {qid}")
    for name, spec in sorted(QUERIES.items()):
        if spec.oracle is None and name not in ROWS_ONLY_ALLOWED:
            problems.append(f"query without oracle not allow-listed: {name}")
        if name in ROWS_ONLY_ALLOWED and spec.oracle is not None:
            problems.append(f"allow-listed rows-only query HAS an oracle: {name}")

    # driver-evidence ledger: which queries have a green row in SOME
    # round's CORRECTNESS file (the driver checks a 50-query window per
    # round in registration order; queries/__init__.py ranks
    # never-checked queries into the window until all are covered).
    # One shared green-row definition: queries/ledger.py
    from file_appender_spark.queries.ledger import checked_queries, green_queries

    green = green_queries()
    checked = checked_queries()
    never = [n for n in QUERIES if n not in checked]
    red = [n for n in QUERIES if n in checked and n not in green]
    print(
        f"driver evidence: {len(green)} green, {len(red)} checked-but-red, "
        f"{len(never)} never in a driver window"
    )
    for n in red:
        # informational, not fatal: a red row stays red in the ledger
        # until a LATER round re-checks the (since-fixed) query —
        # queries/__init__.py ranks it back into the driver window
        print(f"  RED (driver checked, not green yet): {n}")
    for n in never:
        print(f"  never-checked: {n}")

    if problems:
        print("\n".join(problems))
        return 1
    print(f"ok: {len(registered)} queries, docs and registry in sync")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
