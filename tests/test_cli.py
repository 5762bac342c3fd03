"""CLI entry point: python -m file_appender_spark (one-shot SQL /
inventory-query runner over the registered views)."""

from __future__ import annotations

import pytest

from file_appender_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "q01_pricing_summary" in out and "q108_gap_fill" in out


def test_cli_sql_and_named_query(spark, sf_dir, capsys):
    assert main(["--sf-dir", sf_dir, "SELECT count(*) AS n FROM region"]) == 0
    assert "5" in capsys.readouterr().out
    assert main(["--sf-dir", sf_dir, "--query", "q50_dedup_exact"]) == 0
    assert "content_hash" in capsys.readouterr().out
    assert main(["--sf-dir", sf_dir, "--query", "nope"]) == 2


def test_cli_explain(spark, sf_dir, capsys):
    assert main(["--sf-dir", sf_dir, "--explain", "--query", "q01_pricing_summary"]) == 0
    assert "Scan parquet" in capsys.readouterr().out
