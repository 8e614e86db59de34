"""Stable message identity tests (pkg/mail/identity.go): strategy
precedence, scope rules, escaping, fingerprint normalization."""

import pytest

from thecrowler_ray.sources.mail_identity import (
    normalized_fingerprint,
    sha256_content,
    stable_message_identity,
)

FP = "a" * 64


def test_strategy_precedence_and_scopes():
    # provider id wins and EXCLUDES the mailbox (survives moves)
    ref = {"provider": "gmail", "account_id": "acct",
           "provider_message_id": "m-1",
           "mailbox": {"name": "INBOX"}, "uid": 5, "uid_validity": 2}
    ident = stable_message_identity("s1", ref, FP)
    assert ident["strategy"] == "provider_id"
    assert "INBOX" not in ident["id"]
    moved = stable_message_identity(
        "s1", {**ref, "mailbox": {"name": "Archive"}}, FP)
    assert moved["id"] == ident["id"]
    # imap tuple requires uid AND uidvalidity AND mailbox
    imap = {"provider": "imap", "account_id": "acct",
            "mailbox": {"name": "INBOX"}, "uid": 5, "uid_validity": 2}
    i2 = stable_message_identity("s1", imap)
    assert i2["strategy"] == "imap_uid" and ":INBOX:" in i2["id"]
    # missing uidvalidity falls through to content (mailbox-scoped)
    i3 = stable_message_identity(
        "s1", {**imap, "uid_validity": 0}, FP)
    assert i3["strategy"] == "content_sha256"
    i4 = stable_message_identity(
        "s1", {**imap, "uid_validity": 0,
               "mailbox": {"name": "Other"}}, FP)
    assert i4["id"] != i3["id"]  # copies in separate mailboxes distinct


def test_errors_and_escaping():
    with pytest.raises(ValueError):
        stable_message_identity("", {"account_id": "a",
                                     "provider_message_id": "m"})
    with pytest.raises(ValueError):
        stable_message_identity("s", {"account_id": "",
                                      "provider_message_id": "m"})
    with pytest.raises(ValueError):  # nothing stable and no fingerprint
        stable_message_identity("s", {"account_id": "a",
                                      "mailbox": {"name": "I"}})
    with pytest.raises(ValueError):  # fingerprint but no mailbox
        stable_message_identity("s", {"account_id": "a"}, FP)
    # a component containing ':' cannot forge another identity
    tricky = stable_message_identity(
        "s", {"account_id": "a", "provider": "p",
              "provider_message_id": "x:y"})
    plain = stable_message_identity(
        "s", {"account_id": "a", "provider": "p:x",
              "provider_message_id": "y"})
    assert tricky["id"] != plain["id"]


def test_fingerprint_normalization():
    assert normalized_fingerprint(" " + FP.upper() + " ") == FP
    assert normalized_fingerprint("zz") == ""
    assert normalized_fingerprint("g" * 64) == ""
    assert sha256_content(b"abc").startswith("ba7816bf")
    ident = stable_message_identity(
        "s", {"account_id": "a", "provider_message_id": "m"},
        fingerprint="not-hex")
    assert ident["fingerprint"] == ""  # invalid evidence dropped
