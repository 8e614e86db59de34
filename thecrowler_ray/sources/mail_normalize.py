"""Header normalization for mail documents (reference
``pkg/mail/normalize.go``).

The reference's parser retains a *bounded, sanitized* header view on
every normalized mail document: canonical header names, control
characters replaced, DKIM/ARC signature values redacted, per-value /
per-name / total byte budgets with stable truncation warnings — plus
derived fields (message ids, references, list id, subject, date,
addresses) and authentication signals parsed out of
``Authentication-Results`` (normalize.go:28-277). All of it is pure
string work, mirrored here over ``email.message.Message`` /
``{name: [values]}`` inputs:

- retention limits 200 names / 20 values per name / 4096 bytes per
  value / 64 KiB total (normalize.go:14-19), names processed in sorted
  order, truncation marked with ``…`` at a UTF-8 boundary;
- ``b=`` values of Dkim-Signature / Domainkey-Signature / Arc-Seal /
  Arc-Message-Signature replaced with ``b=[redacted]``;
- message-id tokens keep their local part's case but lowercase the
  domain, dedup first-wins (normalize.go:140-163);
- security tokens: first-wins spf/dkim/dmarc/arc (+ ``cv=`` ARC
  fallback and Received-Spf first-token fallback), sticky TLS on
  ``pass``/``yes`` (normalize.go:231-277).

Deviation, documented: address parsing uses Python's lenient
``email.utils.getaddresses`` — a value where no address at all is
recovered yields the reference's ``malformed_address`` warning, but
partially-bad lists degrade instead of failing whole-value like Go's
``mail.ParseAddressList``.
"""

from __future__ import annotations

import re
from email.utils import getaddresses, parsedate_to_datetime

MAX_HEADER_NAMES = 200
MAX_VALUES_PER_HEADER = 20
MAX_HEADER_VALUE_SIZE = 4096
MAX_HEADERS_SIZE = 64 * 1024

_MESSAGE_ID = re.compile(r"<([^<>\s]+)>")
_AUTH_RESULT = re.compile(
    r"(?i)(?:^|[;\s])(?:smtp\.)?(spf|dkim|dmarc|arc|tls)\s*=\s*"
    r"([a-z][a-z0-9_-]*)")
_ARC_CV = re.compile(r"(?i)(?:^|[;\s])cv\s*=\s*([a-z][a-z0-9_-]*)")
_SIG_VALUE = re.compile(r"(?i)(^|;)\s*b\s*=\s*[^;]*")

_SIGNATURE_HEADERS = {"Dkim-Signature", "Domainkey-Signature",
                      "Arc-Seal", "Arc-Message-Signature"}


def canonical_header_key(name: str) -> str:
    """textproto.CanonicalMIMEHeaderKey: Word-Caps per '-' token; names
    with invalid characters are returned unchanged, empty stays empty."""
    if not name or any(ch <= " " or ch >= "\x7f" or ch == ":"
                       for ch in name):
        return name
    return "-".join(tok[:1].upper() + tok[1:].lower()
                    for tok in name.split("-"))


def safe_header_value(value: str) -> str:
    out = []
    for ch in str(value):
        if ch in "\r\n\t":
            out.append(" ")
        elif ch.isprintable() or ch == " ":
            out.append(ch)
        else:
            out.append("�")
    return "".join(out).strip()


def unfold_header_value(value: str) -> str:
    return " ".join(safe_header_value(value).split())


def truncate_utf8(value: str, maximum: int) -> tuple[str, bool]:
    """Byte-budget truncation at a UTF-8 boundary with an ellipsis, like
    the reference (which operates on byte lengths)."""
    raw = value.encode("utf-8")
    if len(raw) <= maximum:
        return value, False
    end = maximum - len("…".encode("utf-8"))
    if end < 0:
        return "", True
    while end > 0 and (raw[end] & 0xC0) == 0x80:
        end -= 1
    return raw[:end].decode("utf-8", "ignore") + "…", True


def redact_signature(value: str) -> str:
    return _SIG_VALUE.sub(r"\1 b=[redacted]", value)


def _warning(code: str, message: str, header: str = "") -> dict:
    category = "malformed_header" if code.startswith("malformed_") else ""
    return {"category": category, "code": code, "message": message,
            "header": header}


def bounded_headers(source: dict[str, list[str]],
                    redact_signatures: bool = True
                    ) -> tuple[dict[str, list[str]], list[dict]]:
    """boundedHeaders (normalize.go:28-74)."""
    retained: dict[str, list[str]] = {}
    warnings: list[dict] = []
    total = 0
    for key in sorted(source):
        if len(retained) >= MAX_HEADER_NAMES:
            warnings.append(_warning(
                "headers_truncated", "header count exceeded retention limit"))
            break
        name = canonical_header_key(key)
        if not name:
            warnings.append(_warning(
                "malformed_header_name", "header name was not retained"))
            continue
        values = source[key]
        limit = len(values)
        if limit > MAX_VALUES_PER_HEADER:
            limit = MAX_VALUES_PER_HEADER
            warnings.append(_warning(
                "header_values_truncated",
                "repeated header values exceeded retention limit", name))
        for value in values[:limit]:
            value = safe_header_value(value)
            if redact_signatures and name in _SIGNATURE_HEADERS:
                value = redact_signature(value)
            value, truncated = truncate_utf8(value, MAX_HEADER_VALUE_SIZE)
            if truncated:
                warnings.append(_warning(
                    "header_value_truncated",
                    "header value exceeded retention limit", name))
            if total + len(name) + len(value.encode()) > MAX_HEADERS_SIZE:
                warnings.append(_warning(
                    "headers_truncated",
                    "headers exceeded total retention limit", name))
                return retained, warnings
            retained.setdefault(name, []).append(value)
            total += len(name) + len(value.encode())
    return retained, warnings


# -- derived fields ----------------------------------------------------------

def _normalize_message_id_token(value: str) -> str:
    value = value.strip()
    if not value or any(ch in "<>\r\n\t " for ch in value):
        return ""
    at = value.rfind("@")
    if at >= 0:
        value = value[:at + 1] + value[at + 1:].lower()
    return "<" + value + ">"


def message_ids(value: str) -> list[str]:
    ids, seen = [], set()
    for match in _MESSAGE_ID.finditer(safe_header_value(value)):
        token = _normalize_message_id_token(match.group(1))
        if token and token not in seen:
            seen.add(token)
            ids.append(token)
    return ids


def normalize_message_id(headers: dict, name: str) -> str:
    for value in headers.get(canonical_header_key(name), []):
        ids = message_ids(value)
        if ids:
            return ids[0]
    return ""


def normalize_references(headers: dict) -> list[str]:
    references, seen = [], set()
    for value in headers.get("References", []):
        for token in message_ids(value):
            if token not in seen:
                seen.add(token)
                references.append(token)
    return references


def normalize_list_id(headers: dict) -> str:
    for value in headers.get("List-Id", []):
        match = _MESSAGE_ID.search(value)
        if match:
            token = match.group(1).strip().lower()
            if token and not any(ch in "<>\r\n\t " for ch in token):
                return token
    return ""


def normalize_subject(headers: dict) -> str:
    for value in headers.get("Subject", []):
        normalized = unfold_header_value(value)
        if normalized:
            return normalized
    return ""


def normalize_date(headers: dict):
    """→ (datetime|None in UTC, original string, warnings)."""
    warnings = []
    for value in headers.get("Date", []):
        original = unfold_header_value(value)
        try:
            parsed = parsedate_to_datetime(original)
            if parsed is not None:
                from datetime import timezone

                if parsed.tzinfo is None:
                    parsed = parsed.replace(tzinfo=timezone.utc)
                return parsed.astimezone(timezone.utc), original, warnings
        except (TypeError, ValueError):
            pass
        warnings.append(_warning("malformed_date",
                                 "Date header could not be parsed", "Date"))
    values = headers.get("Date", [])
    return None, (values[0] if values else ""), warnings


def normalize_addresses(headers: dict, name: str):
    canonical = canonical_header_key(name)
    normalized, warnings = [], []
    for value in headers.get(canonical, []):
        pairs = [(n, a) for n, a in getaddresses([value]) if a.strip()]
        if not pairs:
            if value.strip():
                warnings.append(_warning(
                    "malformed_address",
                    "address header value could not be parsed", canonical))
            continue
        for display, address in pairs:
            normalized.append({"name": unfold_header_value(display),
                               "address": address.strip(),
                               "normalized": address.strip().lower()})
    return normalized, warnings


def normalize_security(headers: dict) -> dict:
    results = list(headers.get("Authentication-Results", [])) + \
        list(headers.get("Arc-Authentication-Results", []))
    security = {"spf": "", "dkim": "", "dmarc": "", "arc": "",
                "tls": False, "authentication_results": results}
    for value in results:
        for method, result in _AUTH_RESULT.findall(value):
            method, result = method.lower(), result.lower()
            if method == "tls":
                security["tls"] = security["tls"] or result in ("pass",
                                                                "yes")
            elif not security[method]:
                security[method] = result
        if not security["arc"]:
            cv = _ARC_CV.search(value)
            if cv:
                security["arc"] = cv.group(1).lower()
    if not security["spf"]:
        for value in headers.get("Received-Spf", []):
            fields = value.split()
            if fields:
                security["spf"] = fields[0].strip(";").lower()
                break
    return security


def header_set(msg) -> tuple[dict, list[dict]]:
    """email.message.Message → the reference's HeaderSet dict + warnings
    (raw = redacted original values; values = RFC 2047-decoded)."""
    from email.header import decode_header, make_header

    source: dict[str, list[str]] = {}
    for key, value in msg.items():
        source.setdefault(key, []).append(str(value))
    raw, warnings = bounded_headers(source, redact_signatures=True)
    decoded_source = {}
    for key, values in source.items():
        out = []
        for value in values:
            try:
                out.append(str(make_header(decode_header(value))))
            except Exception:
                out.append(value)
                warnings.append(_warning(
                    "malformed_encoded_word",
                    "RFC 2047 word could not be decoded",
                    canonical_header_key(key)))
        decoded_source[key] = out
    values, more = bounded_headers(decoded_source, redact_signatures=True)
    warnings.extend(w for w in more if w not in warnings)
    date, original_date, date_warnings = normalize_date(values)
    return {
        "message_id": normalize_message_id(values, "Message-Id"),
        "in_reply_to": normalize_message_id(values, "In-Reply-To"),
        "references": normalize_references(values),
        "list_id": normalize_list_id(values),
        "original_date": original_date,
        "date": date,
        "subject": normalize_subject(values),
        "values": values,
        "raw": raw,
        "security": normalize_security(values),
    }, warnings + date_warnings
