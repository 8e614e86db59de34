"""RFC 5322 → normalized Document (reference ``pkg/mail/processor.go``
+ ``parser.go``).

``process_message`` composes the mail planes into the reference's
transport-neutral Document: bounded/sanitized headers with derived
identity (``mail_normalize``), body selection from the MIME tree,
static HTML text + link extraction with per-link classification
(``mail_links`` — email HTML is untrusted, so extraction never fetches),
attachment gating (``mail_attachments``) with sha256/size metadata for
accepted parts, bounded-depth recursion into attached ``message/rfc822``
parts as child documents (parser.go:353-420), and parsed security
signals. Output is a plain dict tree shaped like the Go Document struct
(document.go:73-105).

Part semantics mirrored: the first non-attachment text/plain and
text/html parts become the bodies; oversized parts are truncated with an
``oversized_part`` warning (parser.go:272-307); encrypted/pkcs7 parts
warn ``protected_content`` and are not decoded.
"""

from __future__ import annotations

import email
import hashlib
from email.message import Message

from .mail_attachments import (
    AttachmentPolicy,
    AttachmentPolicyEvaluator,
    Limits,
    normalize_media_type,
)
from .mail_links import classify_link
from .mail_normalize import header_set, normalize_addresses

DEFAULT_MAX_PART_BYTES = 1 << 20
DEFAULT_MAX_EMBEDDED_DEPTH = 3

_PROTECTED_TYPES = {
    "application/pkcs7-mime", "application/x-pkcs7-mime",
    "multipart/encrypted", "application/pgp-encrypted",
}


def _decode_part(part: Message, max_bytes: int) -> tuple[str, bool]:
    payload = part.get_payload(decode=True)
    if payload is None:
        return "", False
    truncated = False
    if max_bytes > 0 and len(payload) > max_bytes:
        payload = payload[:max_bytes]
        truncated = True
    charset = part.get_content_charset() or "utf-8"
    try:
        return payload.decode(charset, "replace"), truncated
    except LookupError:
        return payload.decode("utf-8", "replace"), truncated


def _is_attachment_part(part: Message) -> bool:
    disposition = (part.get_content_disposition() or "").lower()
    if disposition == "attachment":
        return True
    return bool(part.get_filename()) and disposition != ""




def process_message(source_id: str, raw: bytes | str,
                    policy: AttachmentPolicy | None = None,
                    limits: Limits | None = None,
                    max_part_bytes: int = DEFAULT_MAX_PART_BYTES,
                    max_embedded_depth: int = DEFAULT_MAX_EMBEDDED_DEPTH,
                    cleanup_html: bool = False,
                    _depth: int = 0) -> dict:
    msg = email.message_from_bytes(raw) if isinstance(raw, bytes) \
        else email.message_from_string(raw)
    policy = policy or AttachmentPolicy()
    limits = limits or Limits()
    evaluator = AttachmentPolicyEvaluator(policy, limits)

    hs, warnings = header_set(msg)

    text_body = html_body = ""
    attachments: list[dict] = []
    children: list[dict] = []

    def iter_parts(m: Message):
        """Leaf parts plus message/rfc822 containers (which the email
        package parses as nested containers — recursion must stop at the
        embedded-message boundary, not walk through it)."""
        if normalize_media_type(m.get_content_type()) == "message/rfc822" \
                and m is not msg:
            yield m
            return
        if m.is_multipart():
            for sub in m.get_payload():
                yield from iter_parts(sub)
        else:
            yield m

    part_index = 0
    for part in iter_parts(msg):
        part_index += 1
        part_id = str(part_index)
        content_type = normalize_media_type(part.get_content_type())
        if content_type in _PROTECTED_TYPES:
            warnings.append({"category": "protected_content",
                             "code": "encrypted_part",
                             "message": "part content is protected",
                             "part_id": part_id})
            continue
        if _is_attachment_part(part) or content_type == "message/rfc822":
            payload = part.get_payload(decode=True)
            if payload is None and content_type == "message/rfc822":
                inner = part.get_payload()
                payload = (inner[0].as_bytes()
                           if isinstance(inner, list) and inner else b"")
            payload = payload or b""
            # declared vs sniffed (content_type.go attachmentMediaTypes):
            # compatible declarations win, clear mismatches override
            from .mail_content_type import attachment_media_types

            declared, detected = attachment_media_types(
                part.get_content_type(), payload)
            if content_type == "message/rfc822":
                detected = "message/rfc822"
            inline = (part.get_content_disposition() or "") == "inline"
            skip = evaluator.evaluate(part_id, part.get_content_type(),
                                      detected or content_type,
                                      len(payload), inline)
            if skip is not None:
                warnings.append(skip)
                continue
            if content_type == "message/rfc822" and \
                    _depth < max_embedded_depth:
                children.append(process_message(
                    source_id, payload, policy, limits, max_part_bytes,
                    max_embedded_depth, _depth=_depth + 1)
                    | {"parent_attachment_part_id": part_id})
                continue
            attachments.append({
                "id": (part.get("Content-Id") or "").strip("<>"),
                "part_id": part_id,
                "filename": part.get_filename() or "",
                "sha256": hashlib.sha256(payload).hexdigest(),
                "media_type": content_type,
                "detected_media_type": detected,
                "size": len(payload),
                "disposition": part.get_content_disposition() or
                "attachment",
            })
            continue
        if content_type == "text/plain" and not text_body:
            text_body, truncated = _decode_part(part, max_part_bytes)
            if truncated:
                warnings.append({"category": "oversized_part",
                                 "code": "part_truncated",
                                 "message": "part exceeded size limit",
                                 "part_id": part_id})
        elif content_type == "text/html" and not html_body:
            html_body, truncated = _decode_part(part, max_part_bytes)
            if truncated:
                warnings.append({"category": "oversized_part",
                                 "code": "part_truncated",
                                 "message": "part exceeded size limit",
                                 "part_id": part_id})

    extracted_text = text_body
    links: list[dict] = []
    if html_body:
        # email HTML is untrusted: static extraction only, resources
        # stay inert (processor.go:101-129 via browser.ExtractStaticHTML);
        # cleanup strips preheaders/boilerplate/pixels from a TEMPORARY
        # DOM — html_body itself stays archived unmodified
        from ..static_html import extract_static_html

        html_for_extraction = html_body
        if cleanup_html:
            from .mail_html_cleanup import cleanup_email_html

            html_for_extraction = cleanup_email_html(html_body)
        content = extract_static_html(html_for_extraction)
        extracted_text = content["text"]
        links = [{"url": ln["href"], "text": ln["text"], "title": "",
                  "source": "html",
                  "classification": classify_link(ln["href"])}
                 for ln in content["links"]]

    addresses = {}
    for field_name in ("From", "To", "Cc", "Bcc", "Reply-To"):
        addrs, addr_warnings = normalize_addresses(hs["values"], field_name)
        addresses[field_name] = addrs
        warnings.extend(addr_warnings)

    return {
        "source_id": source_id,
        "message_id": hs["message_id"],
        "date": hs["date"],
        "from": addresses["From"],
        "to": addresses["To"],
        "cc": addresses["Cc"],
        "bcc": addresses["Bcc"],
        "reply_to": addresses["Reply-To"],
        "subject": hs["subject"],
        "headers": {
            "message_id": hs["message_id"],
            "in_reply_to": hs["in_reply_to"],
            "references": hs["references"],
            "list_id": hs["list_id"],
            "original_date": hs["original_date"],
            "values": hs["values"],
            "raw": hs["raw"],
        },
        "text_body": text_body,
        "html_body": html_body,
        "extracted_text": extracted_text,
        "links": links,
        "attachments": attachments,
        "child_documents": children,
        "security": hs["security"],
        "warnings": warnings,
    }
