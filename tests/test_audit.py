"""Docs-vs-code sync is part of the suite: COVERAGE.md and the query
registry must agree (the audit caught real drift once — q40/q41)."""

from __future__ import annotations

import subprocess
import sys
import os


def test_coverage_audit_passes():
    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "audit_coverage.py",
    )
    proc = subprocess.run(
        [sys.executable, script], capture_output=True, text=True, timeout=300
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_driver_window_ranks_unverified_queries_first():
    """Registration order is the driver's check order (first-50
    window): every query lacking a green row in the committed
    CORRECTNESS ledger must precede every query that has one, so each
    round automatically verifies the not-yet-proven tranche."""
    from file_appender_spark.queries import QUERIES
    from file_appender_spark.queries.ledger import green_queries

    green = green_queries()
    if not green:
        return  # fresh checkout without ledger files: nothing to pin
    names = list(QUERIES)
    first_green = min(names.index(g) for g in green if g in names)
    ungreen_after = [n for n in names[first_green:] if n not in green]
    assert not ungreen_after, (
        f"unverified queries ranked behind verified ones: {ungreen_after}"
    )
