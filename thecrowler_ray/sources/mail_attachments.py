"""Attachment policy + child-document descriptors (reference
``pkg/mail/attachment_policy.go`` + ``attachment_descriptor.go``).

The reference's mail parser gates every MIME part through a cheap
metadata-only policy *before* content is copied or hashed: include
switches, denylist-over-allowlist media-type matching with ``type/*``
wildcards, per-attachment and aggregate byte budgets, and a count cap —
rejected parts emit an ``attachment_skipped`` warning with a stable code
and never consume the accepted budgets (attachment_policy.go:32-58).
Permitted attachments publish as *child documents* via descriptors that
use metadata only (never content), with a deterministic SHA-256 fallback
identity so byte-identical duplicates stay distinct children
(attachment_descriptor.go:54-118).

At pipeline scale this is the fan-out point where one crawled mailbox
becomes a document tree: descriptors are tiny rows that flow through the
same dedup/index stages as pages, while attachment bytes stay in object
storage until a fetch job actually needs them.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

SKIP_DISABLED = "attachment_disabled"
SKIP_INLINE_DISABLED = "inline_attachment_disabled"
SKIP_BLOCKED = "attachment_media_type_blocked"
SKIP_NOT_ALLOWED = "attachment_media_type_not_allowed"
SKIP_TOO_LARGE = "attachment_too_large"
SKIP_COUNT = "attachment_count_exceeded"
SKIP_TOTAL_SIZE = "attachment_total_size_exceeded"

RELATIONSHIP_ATTACHMENT = "attachment"
RELATIONSHIP_EMBEDDED_MESSAGE = "embedded_message"


def normalize_media_type(value: str) -> str:
    """content_type.go:36-42 — media type without parameters, lowercased;
    unparseable values normalize to ""."""
    value = (value or "").strip()
    media = value.split(";", 1)[0].strip().lower()
    if not media or "/" not in media or " " in media:
        return ""
    return media


def matches_any_media_type(media_type: str, patterns: list[str]) -> bool:
    media_type = normalize_media_type(media_type)
    for pattern in patterns:
        if pattern == media_type:
            return True
        if pattern.endswith("/*") and media_type.startswith(pattern[:-1]):
            return True
    return False


@dataclass
class AttachmentPolicy:
    include: bool = True
    include_inline: bool = True
    allowed_media_types: list[str] = field(default_factory=list)
    blocked_media_types: list[str] = field(default_factory=list)


@dataclass
class Limits:
    max_attachment_bytes: int = 0
    max_attachments: int = 0
    max_total_attachment_bytes: int = 0


class AttachmentPolicyEvaluator:
    """Stateful per-message evaluator; ``evaluate`` returns None for an
    accepted part or a ParserWarning dict with the skip code."""

    def __init__(self, policy: AttachmentPolicy, limits: Limits):
        self.policy = AttachmentPolicy(
            include=policy.include,
            include_inline=policy.include_inline,
            allowed_media_types=[
                v.strip().lower() for v in policy.allowed_media_types
                if v.strip()],
            blocked_media_types=[
                v.strip().lower() for v in policy.blocked_media_types
                if v.strip()],
        )
        self.limits = limits
        self.accepted_count = 0
        self.accepted_bytes = 0

    def evaluate(self, part_id: str, declared_type: str,
                 detected_type: str, size: int, inline: bool) -> dict | None:
        p, lim = self.policy, self.limits
        if not p.include:
            return self._skip(part_id, SKIP_DISABLED,
                              "attachment emission is disabled")
        if inline and not p.include_inline:
            return self._skip(part_id, SKIP_INLINE_DISABLED,
                              "inline attachment emission is disabled")
        if matches_any_media_type(declared_type, p.blocked_media_types) or \
                matches_any_media_type(detected_type, p.blocked_media_types):
            return self._skip(part_id, SKIP_BLOCKED,
                              "attachment media type is blocked")
        if p.allowed_media_types and not matches_any_media_type(
                detected_type, p.allowed_media_types):
            return self._skip(part_id, SKIP_NOT_ALLOWED,
                              "attachment media type is not allowed")
        if lim.max_attachment_bytes > 0 and size > lim.max_attachment_bytes:
            return self._skip(
                part_id, SKIP_TOO_LARGE,
                "attachment exceeded the per-attachment size limit")
        if lim.max_attachments > 0 and \
                self.accepted_count >= lim.max_attachments:
            return self._skip(part_id, SKIP_COUNT,
                              "message attachment count limit was reached")
        if lim.max_total_attachment_bytes > 0 and \
                size > lim.max_total_attachment_bytes - self.accepted_bytes:
            return self._skip(
                part_id, SKIP_TOTAL_SIZE,
                "message attachment byte limit would be exceeded")
        self.accepted_count += 1
        self.accepted_bytes += size
        return None

    @staticmethod
    def _skip(part_id: str, code: str, message: str) -> dict:
        return {"category": "attachment_skipped", "code": code,
                "message": message, "part_id": part_id}


# -- child-document descriptors ---------------------------------------------

def _attachment_content_type(attachment: dict) -> str:
    return attachment.get("detected_media_type") or \
        attachment.get("media_type", "")


def stable_attachment_descriptor_id(parent: dict, attachment: dict,
                                    ordinal: int) -> str:
    """NUL-separated SHA-256 over metadata + ordinal
    (attachment_descriptor.go:100-118)."""
    h = hashlib.sha256()
    for value in (parent.get("id", ""), parent.get("uri", ""),
                  attachment.get("part_id", ""),
                  attachment.get("filename", ""),
                  attachment.get("sha256", ""),
                  _attachment_content_type(attachment),
                  str(attachment.get("size", 0)),
                  attachment.get("disposition", "")):
        h.update(str(value).encode("utf-8"))
        h.update(b"\x00")
    h.update(str(ordinal).encode())
    h.update(b"\x00")
    return h.hexdigest()


def attachment_document_descriptors(parent: dict,
                                    attachments: list[dict]) -> list[dict]:
    """AttachmentDocumentDescriptors (attachment_descriptor.go:54-84):
    metadata-only child rows in attachment order; blank or duplicate
    attachment IDs fall back to the stable derived identity."""
    descriptors = []
    used = set()
    for index, attachment in enumerate(attachments):
        att_id = (attachment.get("id") or "").strip()
        if not att_id or att_id in used:
            att_id = stable_attachment_descriptor_id(parent, attachment,
                                                     index)
        used.add(att_id)
        descriptors.append({
            "id": att_id,
            "parent_id": parent.get("id", ""),
            "parent_uri": parent.get("uri", ""),
            "part_id": attachment.get("part_id", ""),
            "filename": attachment.get("filename", ""),
            "sha256": attachment.get("sha256", ""),
            "content_type": _attachment_content_type(attachment),
            "size": int(attachment.get("size", 0)),
            "disposition": attachment.get("disposition", ""),
            "relationship": RELATIONSHIP_ATTACHMENT,
        })
    return descriptors
