"""Tokenized JSON-path extraction over nested documents.

Reimplements (semantics only) the reference's attribute-indexing path walker
``pkg/crawler/attribute_indexing.go:197-436`` (ParsePath / ExtractWithTokens):

- dotted paths with bracket indexing: ``a.b[0].c``
- ``[*]`` wildcard fans out over every list element
- a missing segment yields no values (never raises)
- extraction always returns a *list* of leaf values

Command paths (``attribute_indexing.go:60-108``) are modeled as registered
Python callables keyed by ``@name`` path heads.
"""

from __future__ import annotations

import re
from typing import Any, Callable

_TOKEN_RE = re.compile(r"([^.\[\]]+)|\[(\*|\d+)\]")

COMMANDS: dict[str, Callable[[Any], Any]] = {}


def register_command(name: str, fn: Callable[[Any], Any]) -> None:
    COMMANDS[name] = fn


def parse_path(path: str) -> list[str | int]:
    """``"a.b[0].c[*]"`` → ``["a", "b", 0, "c", "*"]``."""
    tokens: list[str | int] = []
    for m in _TOKEN_RE.finditer(path):
        if m.group(1) is not None:
            tokens.append(m.group(1))
        else:
            idx = m.group(2)
            tokens.append("*" if idx == "*" else int(idx))
    return tokens


def extract(obj: Any, path: str) -> list[Any]:
    """All leaf values addressed by *path*; ``@cmd.path`` applies a registered
    command to each extracted value."""
    cmd = None
    if path.startswith("@"):
        head, _, rest = path[1:].partition(".")
        cmd = COMMANDS.get(head)
        path = rest
    values = _walk(obj, parse_path(path), 0)
    if cmd is not None:
        values = [cmd(v) for v in values]
    return values


def _walk(obj: Any, tokens: list[str | int], i: int) -> list[Any]:
    if i == len(tokens):
        return [obj]
    tok = tokens[i]
    if tok == "*":
        if not isinstance(obj, list):
            return []
        out: list[Any] = []
        for item in obj:
            out.extend(_walk(item, tokens, i + 1))
        return out
    if isinstance(tok, int):
        if not isinstance(obj, list) or tok >= len(obj):
            return []
        return _walk(obj[tok], tokens, i + 1)
    if isinstance(obj, dict) and tok in obj:
        return _walk(obj[tok], tokens, i + 1)
    return []
