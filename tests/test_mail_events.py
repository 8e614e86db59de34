"""Email lifecycle-event contract tests (pkg/mail/event_payloads.go,
services/events/email_events.go): digest construction, closed-schema
validation, unknown types pass-through, and bus emission."""

import hashlib

import pytest

from thecrowler_ray.sources.mail_events import (
    EVENT_MESSAGE_DISCOVERED,
    EVENT_RECONCILIATION_COMPLETED,
    SCHEMA_VERSION,
    InvalidEmailEvent,
    email_event_identity,
    message_event_payload,
    reconciliation_completed_payload,
    safe_account_identity,
    safe_digest,
    safe_message_identity,
    validate_email_lifecycle_event,
)


def test_digest_is_length_prefixed_sha256():
    # the Go form hashes "len:value" per component — boundary-proof:
    # ("ab","c") and ("a","bc") must differ
    assert safe_digest("ab", "c") != safe_digest("a", "bc")
    expected = hashlib.sha256(b"7:account" + b"4:imap" + b"2:a1").hexdigest()
    assert safe_digest("account", "imap", "a1") == expected


def test_message_identity_provider_vs_imap():
    a = safe_message_identity("imap", "acct", mailbox_name="INBOX",
                              uid_validity=7, uid=42)
    b = safe_message_identity("imap", "acct", mailbox_name="INBOX",
                              uid_validity=7, uid=43)
    assert a != b and len(a) == 64
    # provider id takes precedence over uid fields
    c = safe_message_identity("gmail", "acct", mailbox_name="INBOX",
                              provider_message_id="m-1", uid=42)
    d = safe_message_identity("gmail", "acct", mailbox_name="INBOX",
                              provider_message_id="m-1", uid=99)
    assert c == d


def test_validation_contract():
    ident = email_event_identity("src-1", "imap", "acct")
    good = message_event_payload(
        EVENT_MESSAGE_DISCOVERED, ident,
        safe_message_identity("imap", "acct", mailbox_name="INBOX", uid=1),
        discovered_count=3)
    validate_email_lifecycle_event(EVENT_MESSAGE_DISCOVERED, good)
    # wrong schema version
    with pytest.raises(InvalidEmailEvent):
        validate_email_lifecycle_event(
            EVENT_MESSAGE_DISCOVERED, {**good, "schema_version": "v2"})
    # missing source, bad digest, control chars
    with pytest.raises(InvalidEmailEvent):
        validate_email_lifecycle_event(
            EVENT_MESSAGE_DISCOVERED, {**good, "source_id": "  "})
    with pytest.raises(InvalidEmailEvent):
        validate_email_lifecycle_event(
            EVENT_MESSAGE_DISCOVERED,
            {**good, "account_identity": "DEADBEEF"})
    with pytest.raises(InvalidEmailEvent):
        validate_email_lifecycle_event(
            EVENT_MESSAGE_DISCOVERED, {**good, "source_id": "a\x00b"})
    # message identity required only for message-scoped events
    listener = {"schema_version": SCHEMA_VERSION, **ident,
                "listener_count": 1}
    validate_email_lifecycle_event("email.listener_started", listener)
    with pytest.raises(InvalidEmailEvent):
        validate_email_lifecycle_event(
            EVENT_MESSAGE_DISCOVERED, listener)
    # unknown event types stay schema-agnostic
    validate_email_lifecycle_event("content_change", {"whatever": 1})


def test_payloads_never_leak_raw_identifiers():
    ident = email_event_identity("src-1", "imap",
                                 "secret-user@example.com",
                                 "Mailbox With Name")
    payload = reconciliation_completed_payload(
        ident, type("S", (), {"accounts": 1, "mailboxes": 2,
                              "messages_new": 5, "errors": []})())
    flat = str(payload)
    assert "secret-user" not in flat and "Mailbox With Name" not in flat
    assert payload["discovered_count"] == 5 and payload["page_count"] == 2


@pytest.mark.usefixtures("ray_session")
def test_emit_run_events_on_bus():
    import ray

    from thecrowler_ray.sources.mail_events import emit_run_events
    from thecrowler_ray.state.events import event_bus

    bus = event_bus("t_mail_events_bus")

    class S:
        accounts, mailboxes, messages_new, errors = 1, 3, 7, ["x"]

    payload = emit_run_events(bus, "src-9", "imap", "acct", S(),
                              duration_sec=1.5, now=100.0)
    events = ray.get(bus.poll.remote(EVENT_RECONCILIATION_COMPLETED, 101.0))
    assert len(events) == 1
    details = events[0]["details"]
    assert details == payload
    assert details["failed_count"] == 1
    validate_email_lifecycle_event(EVENT_RECONCILIATION_COMPLETED, details)
