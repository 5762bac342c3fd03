"""The driver-evidence ledger: one definition of what counts as a
GREEN correctness row, shared by the registration-order ranking
(queries/__init__.py), the coverage audit (scripts/audit_coverage.py)
and the ordering-invariant test — so the driver window, the audit and
the pin test can never silently disagree about "verified".
"""

from __future__ import annotations

import glob
import json
import os


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def is_green(row: object) -> bool:
    """An all-green driver row: rows + schema match, hash matches (or
    the check was rows-only by design, recorded as null), no error."""
    return (
        isinstance(row, dict)
        and bool(row.get("rows_match"))
        and bool(row.get("schema_match"))
        and row.get("hash_match") in (True, None)
        and not row.get("err")
    )


def ledger_rows(root: str | None = None) -> dict[str, dict]:
    """Per-query latest-green-wins view of every committed
    CORRECTNESS_r*.json: maps query name -> {"green": bool,
    "round": basename of the first green round (or last checked),
    "last_green": basename of the LATEST green round (or None)} —
    last_green is what the driver-window ranking uses to re-verify
    the stalest-green tranche first once everything has a row."""
    root = root or repo_root()
    out: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path)
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            entry = out.setdefault(
                name, {"green": False, "round": rnd, "last_green": None}
            )
            if is_green(row):
                if not entry["green"]:
                    entry["green"] = True
                    entry["round"] = rnd
                entry["last_green"] = rnd
    return out


def green_queries(root: str | None = None) -> set[str]:
    return {n for n, e in ledger_rows(root).items() if e["green"]}


def last_green_round(root: str | None = None) -> dict[str, str]:
    """query name -> basename of the latest round with a green row
    (only queries that have ever been green appear)."""
    return {
        n: e["last_green"]
        for n, e in ledger_rows(root).items()
        if e["last_green"] is not None
    }


def checked_queries(root: str | None = None) -> set[str]:
    return set(ledger_rows(root))
