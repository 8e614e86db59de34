"""Attachment media-type sniffing (reference
``pkg/mail/content_type.go``).

Declared MIME types on mail attachments are attacker-controlled; the
parser sniffs the decoded bytes and flags *clearly inconsistent*
declarations (an "invoice.txt" that is actually a PDF). Mirrored:

- sniff order (:44-78): blank → text/plain; ``%PDF-`` prefix;
  HTML via content detection; RFC-822 heuristic (≥2 known headers of
  which ≥1 is mail-specific, :80-114); CSV heuristic (valid UTF-8, no
  NULs, ≥2 rows × ≥2 consistent columns, truncated samples cut at the
  last newline, :116-142); otherwise the content-detection result;
- ``detect_content_type`` is the stdlib-only analog of Go's
  ``http.DetectContentType`` subset the sniffing relies on (HTML tags,
  common magic numbers, binary-vs-text fallback over the first 512
  bytes);
- inconsistency rules (:144-160): octet-stream declarations mismatch
  anything sniffed more specific; pdf/rfc822/html/csv sniffs beat any
  differing declaration; a text/plain sniff only conflicts with
  non-textual declarations (textual = text/*, the JSON/XML/JS/SQL
  application types, and +json/+xml suffixes).
"""

from __future__ import annotations

import csv
import io

from .mail_attachments import normalize_media_type

SNIFF_BYTES = 4096  # reference attachmentSniffBytes (content_type.go:12)

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"%PDF-", "application/pdf"),
    (b"PK\x03\x04", "application/zip"),
    (b"\x1f\x8b\x08", "application/x-gzip"),
    (b"RIFF", None),  # WAVE/WEBP resolved below
    (b"OggS", "application/ogg"),
    (b"\x00\x00\x01\x00", "image/x-icon"),
    (b"BM", "image/bmp"),
    (b"\x7fELF", "application/octet-stream"),
    (b"MZ", "application/octet-stream"),
]

_HTML_TAGS = (b"<!doctype html", b"<html", b"<head", b"<body", b"<script",
              b"<iframe", b"<h1", b"<div", b"<font", b"<table", b"<a",
              b"<style", b"<title", b"<b", b"<br", b"<p", b"<!--")


def detect_content_type(sample: bytes) -> str:
    """http.DetectContentType analog over ≤512 bytes."""
    sample = sample[:512]
    if not sample:
        return "text/plain"
    for bom in (b"\xef\xbb\xbf", b"\xfe\xff", b"\xff\xfe"):
        if sample.startswith(bom):
            return "text/plain"
    trimmed = sample.lstrip(b" \t\r\n")
    lowered = trimmed.lower()
    for tag in _HTML_TAGS:
        if lowered.startswith(tag):
            rest = lowered[len(tag):len(tag) + 1]
            if rest in (b" ", b">", b""):
                return "text/html"
    for magic, media in _MAGIC:
        if sample.startswith(magic):
            if magic == b"RIFF" and len(sample) >= 12:
                kind = sample[8:12]
                if kind == b"WAVE":
                    return "audio/wave"
                if kind == b"WEBP":
                    return "image/webp"
                continue
            if media:
                return media
    # binary-vs-text: any byte outside the "plain text" set → binary
    for b in sample:
        if b <= 0x08 or b == 0x0B or 0x0E <= b <= 0x1A or \
                0x1C <= b <= 0x1F:
            return "application/octet-stream"
    return "text/plain"


_KNOWN_HEADERS = {"date", "from", "to", "cc", "bcc", "subject",
                  "message-id", "mime-version", "content-type",
                  "content-transfer-encoding", "received", "return-path",
                  "reply-to", "sender", "in-reply-to", "references"}
_MAIL_HEADERS = {"received", "return-path", "reply-to", "sender",
                 "in-reply-to", "references", "from", "to", "subject",
                 "message-id", "mime-version"}


def looks_like_rfc822(sample: bytes) -> bool:
    for sep in (b"\n\n", b"\r\n\r\n"):
        if sep in sample:
            header_block = sample.split(sep, 1)[0]
            break
    else:
        return False
    if not header_block:
        return False
    known = mail_specific = 0
    text = header_block.replace(b"\r\n", b"\n").decode("latin-1")
    for line in text.split("\n"):
        if not line or line[0] in " \t":
            continue
        if ":" not in line:
            return False
        name = line.split(":", 1)[0].strip().lower()
        if name in _KNOWN_HEADERS:
            known += 1
            if name in _MAIL_HEADERS:
                mail_specific += 1
    return known >= 2 and mail_specific >= 1


def looks_like_csv(sample: bytes, truncated: bool) -> bool:
    if b"\x00" in sample:
        return False
    try:
        text = sample.decode("utf-8")
    except UnicodeDecodeError:
        return False
    if truncated:
        end = text.rfind("\n")
        if end >= 0:
            text = text[:end + 1]
    if text.count("\n") < 1:
        return False
    try:
        records = [r for r in csv.reader(io.StringIO(text)) if r]
    except csv.Error:
        return False
    if len(records) < 2 or len(records[0]) < 2:
        return False
    return all(len(r) == len(records[0]) for r in records[1:])


def sniff_attachment_media_type(content: bytes) -> str:
    """sniffAttachmentMediaType (:44-78)."""
    if not content:
        return ""
    truncated = len(content) > SNIFF_BYTES
    sample = content[:SNIFF_BYTES]
    if not sample.strip():
        return "text/plain"
    if sample.lstrip().startswith(b"%PDF-"):
        return "application/pdf"
    detected = normalize_media_type(detect_content_type(sample[:512]))
    if detected == "text/html":
        return detected
    if looks_like_rfc822(sample):
        return "message/rfc822"
    if looks_like_csv(sample, truncated):
        return "text/csv"
    return detected


def is_textual_media_type(media_type: str) -> bool:
    if media_type.startswith("text/"):
        return True
    if media_type in ("application/json", "application/ld+json",
                      "application/xml", "application/xhtml+xml",
                      "application/javascript", "application/sql",
                      "application/x-www-form-urlencoded"):
        return True
    return media_type.endswith("+json") or media_type.endswith("+xml")


def media_types_clearly_inconsistent(declared: str, sniffed: str) -> bool:
    """mediaTypesClearlyInconsistent (:144-160) — inputs normalized."""
    if declared == sniffed:
        return False
    if declared == "application/octet-stream":
        return sniffed != "application/octet-stream"
    if sniffed in ("application/pdf", "message/rfc822", "text/html",
                   "text/csv"):
        return True
    if sniffed == "text/plain":
        return not is_textual_media_type(declared)
    return False


def attachment_media_types(declared: str, content: bytes) -> tuple[str, str]:
    """attachmentMediaTypes (:17-34) → (declared, detected): a sniff that
    merely refines a compatible declaration defers to it; a clearly
    inconsistent one overrides; empty content gets the safe binary
    fallback."""
    declared = normalize_media_type(declared)
    sniffed = sniff_attachment_media_type(content)
    if not sniffed:
        if declared:
            return declared, declared
        return "", "application/octet-stream"
    if not declared:
        return "", sniffed
    if not media_types_clearly_inconsistent(declared, sniffed):
        return declared, declared
    return declared, sniffed
