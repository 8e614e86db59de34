"""Content-type detection.

Reimplements the reference's detection surface (semantics only):

- extension → MIME map (``pkg/crawler/types.go:323-413`` ``docTypeMap``;
  standard MIME assignments, representative subset)
- HTML sniffing (``pkg/crawler/web.go:3044-3088``): leading ``<!doctype html``
  / ``<html`` / a handful of telltale tags
- pattern rules over URL + content per type, mirroring the shape of
  ``support/content_type_detection.yaml`` consumed by
  ``pkg/crawler/content_type.go``.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

DOC_TYPE_MAP: dict[str, str] = {
    ".html": "text/html", ".htm": "text/html", ".xhtml": "application/xhtml+xml",
    ".txt": "text/plain", ".md": "text/markdown", ".csv": "text/csv",
    ".xml": "application/xml", ".json": "application/json",
    ".pdf": "application/pdf", ".ps": "application/postscript",
    ".doc": "application/msword", ".docx":
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    ".xls": "application/vnd.ms-excel", ".xlsx":
        "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    ".ppt": "application/vnd.ms-powerpoint",
    ".png": "image/png", ".jpg": "image/jpeg", ".jpeg": "image/jpeg",
    ".gif": "image/gif", ".webp": "image/webp", ".svg": "image/svg+xml",
    ".ico": "image/x-icon", ".bmp": "image/bmp", ".tif": "image/tiff",
    ".mp3": "audio/mpeg", ".wav": "audio/wav", ".ogg": "audio/ogg",
    ".flac": "audio/flac", ".m4a": "audio/mp4",
    ".mp4": "video/mp4", ".webm": "video/webm", ".avi": "video/x-msvideo",
    ".mov": "video/quicktime", ".mkv": "video/x-matroska",
    ".zip": "application/zip", ".tar": "application/x-tar",
    ".gz": "application/gzip", ".7z": "application/x-7z-compressed",
    ".js": "application/javascript", ".css": "text/css",
    ".woff": "font/woff", ".woff2": "font/woff2", ".ttf": "font/ttf",
    ".rss": "application/rss+xml", ".atom": "application/atom+xml",
}

_HTML_SNIFF_RE = re.compile(
    r"(?is)^\s*(?:<!doctype\s+html|<html\b)|<(?:head|body|title|div|meta)\b"
)


def sniff_html(content: str | bytes) -> bool:
    if isinstance(content, bytes):
        content = content[:4096].decode("utf-8", errors="replace")
    return bool(_HTML_SNIFF_RE.search(content[:4096]))


def doc_type_is_html(mime: str) -> bool:
    m = mime.strip().lower()
    return m in ("text/html", "application/xhtml+xml") or m == ""


def infer_document_type(url: str, content: str | None = None) -> str:
    """Content sniff first (like the reference's page-source check), then the
    extension map, else ``UNKNOWN``."""
    if content is not None and sniff_html(content):
        return "text/html"
    path = urlparse(url.strip()).path
    dot = path.rfind(".")
    if dot != -1 and "/" not in path[dot:]:
        ext = path[dot:].strip().lower()
        if ext in DOC_TYPE_MAP:
            return DOC_TYPE_MAP[ext]
    return "UNKNOWN"


# media kinds for span classification
def media_kind(mime: str) -> str:
    top = mime.split("/", 1)[0]
    return top if top in ("image", "audio", "video") else "binary"


def content_type_rules_from_yaml(yaml_text: str) -> list[dict]:
    """Load content-type detection rules shaped like the reference's
    ``support/content_type_detection.yaml`` (consumed by
    ``pkg/crawler/content_type.go``): per-type ``content_patterns`` and
    ``url_patterns`` regex lists."""
    import yaml as _yaml

    doc = _yaml.safe_load(yaml_text) or {}
    rules = []
    for type_name, spec in doc.items():
        spec = spec or {}
        rules.append(
            {
                "type": type_name,
                "content_patterns": [
                    re.compile(p, re.I) for p in spec.get("content_patterns", []) or []
                ],
                "url_patterns": [
                    re.compile(p, re.I) for p in spec.get("url_patterns", []) or []
                ],
            }
        )
    return rules


def detect_by_rules(url: str, content: str, rules: list[dict]) -> str:
    """First rule (in document order) with any matching content or URL
    pattern wins; falls back to ``infer_document_type``."""
    head = (content or "")[:8192]
    for rule in rules:
        if any(p.search(head) for p in rule["content_patterns"]):
            return rule["type"]
        if any(p.search(url or "") for p in rule["url_patterns"]):
            return rule["type"]
    return infer_document_type(url, content)
