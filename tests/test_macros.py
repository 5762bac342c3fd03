"""Runtime macro substitution (reference A17,
PipelineTest.java:127-129)."""

from __future__ import annotations

import pytest

from file_appender_spark.config import AppendSinkConfig
from file_appender_spark.macros import MacroError, resolve_config, substitute


def test_substitute_basic():
    assert substitute("${dir}/out", {"dir": "/data"}) == "/data/out"


def test_substitute_multiple_and_nonstring():
    assert substitute("${a}-${b}", {"a": 1, "b": "x"}) == "1-x"


def test_unresolved_macro_raises():
    with pytest.raises(MacroError):
        substitute("${missing}", {})


def test_resolve_config_substitutes_string_fields():
    cfg = AppendSinkConfig(output_dir="${dir}/sink", file_prefix="${prefix}")
    out = resolve_config(cfg, {"dir": "/data", "prefix": "run1"})
    assert out.output_dir == "/data/sink"
    assert out.file_prefix == "run1"
    # untouched fields carried over
    assert out.size_threshold_mb == cfg.size_threshold_mb
    # original unmodified
    assert cfg.output_dir == "${dir}/sink"


def test_resolve_config_noop_without_macros():
    cfg = AppendSinkConfig(output_dir="/plain")
    assert resolve_config(cfg, {}) is cfg
