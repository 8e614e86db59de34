"""Email lifecycle-event contracts (reference
``pkg/mail/event_payloads.go`` + ``services/events/email_events.go``).

The reference's mail pipeline emits privacy-preserving ``email.*``
events into the Events table: every payload carries only the
application-owned source id plus opaque SHA-256 *correlation digests*
for account/mailbox/message (never addresses, names, subjects or
provider ids), under the closed schema ``email.lifecycle.v1``. The
events service validates inbound events against these closed contracts
(``validateEmailLifecycleEvent``, email_events.go:17-51) while leaving
other event types schema-agnostic. Mirrored semantics:

- digests are the Go length-prefixed form ``sha256("len:value" ...)``
  (logging.go safeLogDigest / events.go SafeEmailEventIdentity) so two
  implementations watching the same mailbox correlate identically;
- message identity prefers provider ids and falls back to IMAP
  uidvalidity/uid (logging.go:189-207);
- validation: schema_version pinned, source_id required / ≤1024 bytes /
  no control chars, every identity a lowercase 64-hex digest
  (events.go:270-292, event_payloads.go:188-226);
- unknown event types validate as OK (backward compatibility).

``emit_run_events`` turns a mail-pipeline :class:`RunSummary` into the
``email.reconciliation_completed`` payload and publishes it on the
repo's EventBus actor, closing the loop from ``run_mail_pipeline`` to
the §3.3 event consumers.
"""

from __future__ import annotations

import hashlib
import re

SCHEMA_VERSION = "email.lifecycle.v1"

EVENT_MESSAGE_DISCOVERED = "email.message_discovered"
EVENT_MESSAGE_FETCHED = "email.message_fetched"
EVENT_MESSAGE_PARSED = "email.message_parsed"
EVENT_MESSAGE_FAILED = "email.message_failed"
EVENT_MESSAGE_COMPLETED = "email.message_completed"
EVENT_LISTENER_STARTED = "email.listener_started"
EVENT_LISTENER_STOPPED = "email.listener_stopped"
EVENT_RECONCILIATION_COMPLETED = "email.reconciliation_completed"

_MAX_STRING_BYTES = 1024
_HEX64 = re.compile(r"^[0-9a-f]{64}$")

# counts required per message-scoped event type (beyond the identity)
_MESSAGE_EVENTS = {
    EVENT_MESSAGE_DISCOVERED, EVENT_MESSAGE_FETCHED, EVENT_MESSAGE_PARSED,
    EVENT_MESSAGE_FAILED, EVENT_MESSAGE_COMPLETED,
}
_LIFECYCLE_EVENTS = _MESSAGE_EVENTS | {
    EVENT_LISTENER_STARTED, EVENT_LISTENER_STOPPED,
    EVENT_RECONCILIATION_COMPLETED,
}


class InvalidEmailEvent(ValueError):
    pass


def safe_digest(*components: str) -> str:
    """Length-prefixed SHA-256 (logging.go safeLogDigest): each component
    contributes ``"{len}:{value}"`` so boundaries can't be confused."""
    h = hashlib.sha256()
    for c in components:
        h.update(str(len(c)).encode())
        h.update(b":")
        h.update(c.encode())
    return h.hexdigest()


def safe_account_identity(provider: str, account_id: str) -> str:
    """SafeEmailAccountIdentity: digest over ("account", provider, id)
    with trimmed values (event_payloads.go:168-171)."""
    return safe_digest("account", provider.strip(), account_id.strip())


def safe_mailbox_identity(provider: str, account_id: str,
                          mailbox_id: str = "",
                          mailbox_name: str = "") -> str:
    """SafeEmailEventIdentity (events.go:242-256)."""
    return safe_digest(provider.strip(), account_id.strip(),
                       mailbox_id.strip(), mailbox_name.strip())


def safe_message_identity(provider: str, account_id: str,
                          mailbox_id: str = "", mailbox_name: str = "",
                          provider_message_id: str = "",
                          uid_validity: int = 0, uid: int = 0,
                          version: str = "") -> str:
    """safeMessageIdentity (logging.go:189-207): provider id wins, IMAP
    uidvalidity/uid otherwise."""
    mb = (mailbox_id.strip() or mailbox_name.strip())
    mailbox_digest = safe_digest("mailbox", mb) if mb else ""
    parts = [provider.strip(), account_id.strip(), mailbox_digest]
    if provider_message_id.strip():
        parts += ["provider", provider_message_id.strip(), version.strip()]
    else:
        parts += ["imap", str(uid_validity), str(uid), version.strip()]
    return safe_digest(*parts)


def email_event_identity(source_id: str, provider: str, account_id: str,
                         mailbox_id: str = "",
                         mailbox_name: str = "") -> dict:
    return {
        "source_id": source_id.strip(),
        "account_identity": safe_account_identity(provider, account_id),
        "mailbox_identity": safe_mailbox_identity(
            provider, account_id, mailbox_id, mailbox_name),
    }


# -- validation (the events-service inbound gate) ---------------------------

def _validate_event_string(field: str, value, required: bool) -> None:
    if not isinstance(value, str):
        raise InvalidEmailEvent(f"{field} must be a string")
    if required and not value.strip():
        raise InvalidEmailEvent(f"{field} is required")
    if len(value.encode("utf-8")) > _MAX_STRING_BYTES:
        raise InvalidEmailEvent(
            f"{field} exceeds {_MAX_STRING_BYTES} bytes")
    if any(ord(ch) < 0x20 or ord(ch) == 0x7F for ch in value):
        raise InvalidEmailEvent(f"{field} contains control characters")


def _validate_identity(details: dict, message_scoped: bool) -> None:
    _validate_event_string("source_id", details.get("source_id", ""), True)
    for field in (["account_identity", "mailbox_identity"]
                  + (["message_identity"] if message_scoped else [])):
        v = details.get(field, "")
        if not isinstance(v, str) or not _HEX64.match(v):
            raise InvalidEmailEvent(
                f"{field} must be a lowercase SHA-256 digest")


def validate_email_lifecycle_event(event_type: str, details: dict) -> None:
    """validateEmailLifecycleEvent (email_events.go:17-51): closed
    contracts for email.* types, no-op for everything else."""
    if event_type not in _LIFECYCLE_EVENTS:
        return
    if not isinstance(details, dict):
        raise InvalidEmailEvent("details must be an object")
    if details.get("schema_version") != SCHEMA_VERSION:
        raise InvalidEmailEvent(
            f'schema_version must be "{SCHEMA_VERSION}"')
    _validate_identity(details, event_type in _MESSAGE_EVENTS)


# -- payload builders --------------------------------------------------------

def message_event_payload(event_type: str, identity: dict,
                          message_identity: str, **counts) -> dict:
    payload = {"schema_version": SCHEMA_VERSION, **identity,
               "message_identity": message_identity, **counts}
    validate_email_lifecycle_event(event_type, payload)
    return payload


def reconciliation_completed_payload(identity: dict, summary,
                                     duration_sec: float = 0.0) -> dict:
    """reconciliationCompletedPayload (event_payloads.go:128-145) over
    the repo's RunSummary (accounts/mailboxes/messages_new/errors)."""
    payload = {
        "schema_version": SCHEMA_VERSION, **identity,
        "discovered_count": int(getattr(summary, "messages_new", 0)),
        "fetched_count": int(getattr(summary, "messages_new", 0)),
        "parsed_count": int(getattr(summary, "messages_new", 0)),
        "failed_count": len(getattr(summary, "errors", []) or []),
        "completed_count": int(getattr(summary, "messages_new", 0)),
        "skipped_count": 0, "quarantined_count": 0, "retry_count": 0,
        "warning_count": 0,
        "page_count": int(getattr(summary, "mailboxes", 0)),
        "duration": duration_sec,
    }
    validate_email_lifecycle_event(EVENT_RECONCILIATION_COMPLETED, payload)
    return payload


def emit_run_events(bus, source_id: str, provider: str, account_id: str,
                    summary, duration_sec: float = 0.0,
                    now: float | None = None) -> dict:
    """Publish the run's reconciliation_completed event on the EventBus
    actor (services/events/main.go:1185 event.created path). Returns the
    payload for the caller's logs."""
    import ray

    identity = email_event_identity(source_id, provider, account_id)
    payload = reconciliation_completed_payload(identity, summary,
                                               duration_sec)
    ray.get(bus.publish.remote(
        EVENT_RECONCILIATION_COMPLETED, EVENT_RECONCILIATION_COMPLETED,
        details=payload, now=now))
    return payload
