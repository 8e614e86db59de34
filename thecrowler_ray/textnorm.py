"""Text / attribute normalizers.

Reimplements (semantics only) the reference's sanitizer and normalizer chain:

- ``fix_utf8`` / ``normalize_unicode`` / ``sanitize_string`` /
  ``unix_to_datetime`` — ``pkg/crawler/attribute_indexing.go:110-185,438-460``
- the named-normalizer registry applied in order with ``fix_utf8`` force
  prepended — ``pkg/crawler/attribute_indexing.go:74-107,463-486``
- ``normalize_text`` (keyword pre-normalization: strip tags, punctuation →
  space, lowercase, collapse whitespace) — ``pkg/crawler/keywords.go:306-326``
- ``str_left`` rune-safe truncation — ``pkg/crawler/crawler.go:1371-1377``
- stable-key JSON for hashing — ``pkg/crawler/json_normalization.go``
"""

from __future__ import annotations

import datetime as _dt
import json
import re
import unicodedata

_TAG_RE = re.compile(r"<[^>]*>")
_SCRIPT_STYLE_RE = re.compile(r"(?is)<script.*?/script>|<style.*?/style>")
_KW_PUNCT_RE = re.compile(r"[.,?!:;'\"(){}<>\-]")
_WS_RE = re.compile(r"\s+")
_PUNCT_TABLE = str.maketrans("", "", r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""")
_CTRL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")


def fix_utf8(s: str) -> str:
    """Valid UTF-8, NUL and control characters stripped."""
    s = s.encode("utf-8", errors="replace").decode("utf-8", errors="replace")
    return _CTRL_RE.sub("", s.replace("\x00", ""))


def normalize_unicode(s: str) -> str:
    return unicodedata.normalize("NFC", s)


def sanitize_string(s: str) -> str:
    return fix_utf8(s).strip()


def unix_to_datetime(s: str) -> str:
    try:
        ts = float(str(s).strip())
    except (TypeError, ValueError):
        return str(s)
    return _dt.datetime.fromtimestamp(ts, tz=_dt.timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def normalize_url_attr(s: str) -> str:
    """Lowercase scheme+host, drop fragment (attribute normalizer flavor)."""
    from urllib.parse import urlsplit, urlunsplit

    try:
        parts = urlsplit(s.strip())
    except ValueError:
        return s.strip()
    return urlunsplit(
        (parts.scheme.lower(), parts.netloc.lower(), parts.path, parts.query, "")
    )


def normalize_email(s: str) -> str:
    return s.strip().lower()


NORMALIZERS = {
    "fix_utf8": fix_utf8,
    "lowercase": str.lower,
    "uppercase": str.upper,
    "trim": str.strip,
    "collapse_spaces": lambda s: _WS_RE.sub(" ", s),
    "remove_punctuation": lambda s: s.translate(_PUNCT_TABLE),
    "normalize_url": normalize_url_attr,
    "normalize_email": normalize_email,
    "normalize_unicode": normalize_unicode,
    "sanitize_string": sanitize_string,
    "unix_to_datetime": unix_to_datetime,
}


def apply_normalizers(value: str, names: list[str]) -> str:
    """Apply named normalizers in order; ``fix_utf8`` is force-prepended."""
    chain = ["fix_utf8"] + [n for n in names if n != "fix_utf8"]
    for name in chain:
        fn = NORMALIZERS.get(name)
        if fn is not None:
            value = fn(value)
    return value


def normalize_text(text: str) -> str:
    """Keyword pre-normalization: tags → space, punctuation → space,
    lowercase, collapse whitespace."""
    text = _TAG_RE.sub(" ", text)
    text = _SCRIPT_STYLE_RE.sub(" ", text)
    text = _KW_PUNCT_RE.sub(" ", text)
    text = text.lower()
    return " ".join(text.split())


def str_left(s: str, n: int) -> str:
    """Rune-safe left truncation (Python strings are already code points)."""
    return s[:n]


def stable_json(obj) -> str:
    """Deterministic JSON (sorted keys, no NaN) for content hashing."""
    return json.dumps(obj, sort_keys=True, ensure_ascii=False, separators=(",", ":"))


def sanitize_json(s: str) -> str:
    """Strip NUL and control characters that JSONB rejects (reference
    SanitizeJSON, ``pkg/common/json.go``)."""
    return _CTRL_RE.sub("", s.replace("\x00", ""))


def remove_impurities(s: str) -> str:
    """Repair near-JSON text (reference ``removeImpurities``,
    ``pkg/crawler/web.go:3327-3368``): outside strings keep only JSON
    structural characters / literals / digits / whitespace, collapse
    duplicate commas; string contents (with escapes) pass through."""
    out: list[str] = []
    quotes = False
    escape = False
    prev_comma = False
    allowed = set("[]{}:truefalsenull0123456789.+-eE")
    for ch in s:
        if escape:
            out.append(ch)
            escape = False
            continue
        if ch == "\\":
            escape = True
            out.append(ch)
            continue
        if ch == '"':
            quotes = not quotes
            out.append(ch)
            prev_comma = False
            continue
        if quotes:
            out.append(ch)
            continue
        if ch == ",":
            if prev_comma:
                continue
            out.append(ch)
            prev_comma = True
            continue
        if ch in allowed or ch.isspace():
            out.append(ch)
            if not ch.isspace():
                prev_comma = False
    return "".join(out)
