"""Post-processing transforms for scraped values.

Reimplements (semantics only) ``pkg/scraper/transforms.go:21-94``:

- ``replace(value, pattern, replacement)`` — regex replace
- ``remove(value, pattern)`` — regex delete
- ``clean(value, steps)`` with the reference's named cleaning steps:
  decode_html_entities, remove_html, remove_numbers, remove_special_chars,
  remove_newlines, remove_whitespace, remove_extra_whitespace
- ``validate(value, required_keys)`` — JSON validity + required keys
"""

from __future__ import annotations

import html
import json
import re

_HTML_RE = re.compile(r"<[^>]*>")
_NUM_RE = re.compile(r"\d+")
_SPECIAL_RE = re.compile(r"[^A-Za-z0-9\s]")
_WS_RE = re.compile(r"\s+")

CLEAN_STEPS = {
    "decode_html_entities": html.unescape,
    "remove_html": lambda s: _HTML_RE.sub("", s),
    "remove_numbers": lambda s: _NUM_RE.sub("", s),
    "remove_special_chars": lambda s: _SPECIAL_RE.sub("", s),
    "remove_newlines": lambda s: s.replace("\n", " ").replace("\r", " "),
    "remove_whitespace": lambda s: re.sub(r"\s", "", s),
    "remove_extra_whitespace": lambda s: _WS_RE.sub(" ", s).strip(),
}


def transform_replace(value: str, pattern: str, replacement: str) -> str:
    return re.sub(pattern, replacement, value)


def transform_remove(value: str, pattern: str) -> str:
    return re.sub(pattern, "", value)


def transform_clean(value: str, steps: list[str]) -> str:
    for step in steps:
        fn = CLEAN_STEPS.get(step)
        if fn is not None:
            value = fn(value)
    return value


def transform_validate(value: str, required_keys: list[str] | None = None) -> bool:
    try:
        obj = json.loads(value)
    except (ValueError, TypeError):
        return False
    if required_keys:
        if not isinstance(obj, dict):
            return False
        return all(k in obj for k in required_keys)
    return True
