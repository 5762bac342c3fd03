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
