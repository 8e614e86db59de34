"""Stable message identity selection (reference ``pkg/mail/identity.go``).

Indexing needs one durable id per message; the reference picks the
strongest provider-neutral evidence in a fixed order (:63-111):

1. ``provider_id`` — account-scoped API id; deliberately excludes the
   mailbox so moves/label changes keep the identity;
2. ``imap_uid`` — mailbox + UIDVALIDITY + UID (all required: a UID is
   meaningless outside its UIDVALIDITY epoch);
3. ``content_sha256`` — last resort, mailbox-scoped so equal copies in
   different mailboxes stay distinct documents; the fingerprint is
   retained independently as dedup evidence under every strategy.

Ids are colon-joined ``mail:<strategy>:<query-escaped components>``
(:131-139), so a component containing ``:`` can't forge another id.
Fingerprints normalize to lowercase 64-hex or "" (:120-129).
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import quote

IDENTITY_PROVIDER_ID = "provider_id"
IDENTITY_IMAP_UID = "imap_uid"
IDENTITY_CONTENT_SHA256 = "content_sha256"

_HEX64 = re.compile(r"^[0-9a-f]{64}$")


def sha256_content(content: bytes) -> str:
    if content is None:
        raise ValueError("cannot fingerprint nil content")
    return hashlib.sha256(content).hexdigest()


def normalized_fingerprint(fingerprint: str) -> str:
    fingerprint = (fingerprint or "").strip().lower()
    return fingerprint if _HEX64.match(fingerprint) else ""


def _identity_id(strategy: str, *components: str) -> str:
    # Go's url.QueryEscape percent-encodes ':' and spaces as '+'
    return ":".join(["mail", strategy]
                    + [quote(c, safe="").replace("%20", "+")
                       for c in components])


def stable_message_identity(source_id: str, ref: dict,
                            fingerprint: str = "") -> dict:
    """StableMessageIdentity (:63-111): returns
    ``{id, strategy, fingerprint}``; raises ValueError like the
    reference's error paths."""
    source_id = (source_id or "").strip()
    account_id = (ref.get("account_id") or "").strip()
    if not source_id:
        raise ValueError("stable identity requires source ID")
    if not account_id:
        raise ValueError("stable identity requires account ID")

    provider = (ref.get("provider") or "").strip()
    provider_message_id = (ref.get("provider_message_id") or "").strip()
    if provider_message_id:
        return {"id": _identity_id(IDENTITY_PROVIDER_ID, source_id,
                                   account_id, provider,
                                   provider_message_id),
                "strategy": IDENTITY_PROVIDER_ID,
                "fingerprint": normalized_fingerprint(fingerprint)}

    mailbox = ref.get("mailbox") or {}
    mailbox_id = (mailbox.get("id") or "").strip() or \
        (mailbox.get("name") or "").strip()
    uid = int(ref.get("uid") or 0)
    uid_validity = int(ref.get("uid_validity") or 0)
    if uid and uid_validity and mailbox_id:
        return {"id": _identity_id(IDENTITY_IMAP_UID, source_id,
                                   account_id, mailbox_id,
                                   str(uid_validity), str(uid)),
                "strategy": IDENTITY_IMAP_UID,
                "fingerprint": normalized_fingerprint(fingerprint)}

    fingerprint = normalized_fingerprint(fingerprint)
    if not fingerprint:
        raise ValueError("stable identity requires a provider ID, an "
                         "IMAP UID tuple, or a SHA-256 content fingerprint")
    if not mailbox_id:
        raise ValueError("content identity requires a mailbox ID or name")
    return {"id": _identity_id(IDENTITY_CONTENT_SHA256, source_id,
                               account_id, mailbox_id, fingerprint),
            "strategy": IDENTITY_CONTENT_SHA256,
            "fingerprint": fingerprint}
