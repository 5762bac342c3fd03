"""Runtime macro substitution (reference A17): config values may
contain ``${name}`` placeholders substituted from per-run arguments
(PipelineTest.java:127-129 — "the ${dir} macro will be substituted";
outputDir config FileAppenderSinkConfig.java:22-24).

Strict by default: an unresolved macro raises (the reference's
pipeline framework fails deployment on missing macros)."""

from __future__ import annotations

import re
from dataclasses import replace
from typing import Any, Mapping

_MACRO = re.compile(r"\$\{([^}]+)\}")


class MacroError(KeyError):
    pass


def substitute(value: str, args: Mapping[str, Any]) -> str:
    def repl(m: re.Match) -> str:
        name = m.group(1)
        if name not in args:
            raise MacroError(f"unresolved macro ${{{name}}}")
        return str(args[name])

    return _MACRO.sub(repl, value)


def resolve_config(config, args: Mapping[str, Any]):
    """Return a copy of a dataclass config with every string field
    macro-substituted."""
    updates = {
        f: substitute(v, args)
        for f, v in vars(config).items()
        if isinstance(v, str) and "${" in v
    }
    return replace(config, **updates) if updates else config
