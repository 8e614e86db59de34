"""Checkpoint store + lifecycle tests (pkg/mail/database_state_store.go,
message_status.go)."""

import pytest

from thecrowler_ray.sources.mail_state import (
    CheckpointConflict,
    CheckpointStore,
    InvalidCheckpoint,
    can_transition,
    empty_checkpoint,
    validate_checkpoint,
    validate_status_transition,
)

KEY = {"source_id": 1, "provider": "IMAP", "account_id": "acct",
       "mailbox": {"name": "INBOX"}}


def test_lifecycle_dag():
    path = ["discovered", "fetched", "parsed", "normalized",
            "attachments_processed", "links_enqueued", "completed"]
    for cur, nxt in zip(path, path[1:]):
        validate_status_transition(cur, nxt)
    # every active state may fail either way; retryable restarts
    for cur in path[:-1]:
        assert can_transition(cur, "permanent_failure")
    assert can_transition("retryable_failure", "discovered")
    assert can_transition("retryable_failure", "permanent_failure")
    # no skipping, no leaving terminals
    assert not can_transition("discovered", "parsed")
    with pytest.raises(InvalidCheckpoint):
        validate_status_transition("completed", "discovered")
    with pytest.raises(InvalidCheckpoint):
        validate_status_transition("parsed", "bogus")


def test_checkpoint_bounds():
    cp = empty_checkpoint()
    cp["last_error"] = "x" * 2049
    with pytest.raises(InvalidCheckpoint):
        validate_checkpoint(cp)
    cp2 = empty_checkpoint()
    cp2["renewal"] = {"subscription_id": "s" * 192}
    with pytest.raises(InvalidCheckpoint):
        validate_checkpoint(cp2)
    cp3 = empty_checkpoint()
    cp3["message_status"] = "weird"
    with pytest.raises(InvalidCheckpoint):
        validate_checkpoint(cp3)


def test_cas_commits(tmp_path):
    store = CheckpointStore(str(tmp_path / "cp.json"))
    assert store.load_checkpoint(KEY)["version"] == ""
    cp = empty_checkpoint()
    cp["cursor"] = {"uid": 5, "uid_validity": 2}
    cp["message_status"] = "discovered"
    v1 = store.commit_checkpoint(KEY, "", cp)
    # stale version → conflict; fresh key with a version → conflict
    with pytest.raises(CheckpointConflict):
        store.commit_checkpoint(KEY, "", cp)
    with pytest.raises(CheckpointConflict):
        store.commit_checkpoint(
            {**KEY, "mailbox": {"name": "Other"}}, "vX", cp)
    # transition enforced against the stored row
    cp2 = dict(cp, message_status="parsed")
    with pytest.raises(InvalidCheckpoint):
        store.commit_checkpoint(KEY, v1, cp2)
    cp2["message_status"] = "fetched"
    v2 = store.commit_checkpoint(KEY, v1, cp2)
    assert v2 != v1
    # durable across re-open
    store2 = CheckpointStore(str(tmp_path / "cp.json"))
    loaded = store2.load_checkpoint(KEY)
    assert loaded["message_status"] == "fetched"
    assert loaded["cursor"]["uid"] == 5
    with pytest.raises(InvalidCheckpoint):
        store2.load_checkpoint({"source_id": "", "provider": "imap",
                                "account_id": "a",
                                "mailbox": {"name": "I"}})


def test_renewal_coordinator_integration(tmp_path):
    from datetime import datetime, timedelta, timezone

    from thecrowler_ray.sources.mail_renewal import RenewalCoordinator

    T0 = datetime(2026, 8, 17, tzinfo=timezone.utc)
    store = CheckpointStore(str(tmp_path / "cp.json"))
    c = RenewalCoordinator(
        store, lambda k: {"subscription_id": "sub", "resource_path": "r",
                          "expires_at": T0 + timedelta(hours=1)},
        safety_margin=60, now=lambda: T0)
    d = c.renew_if_due(KEY)
    assert d["renewed"]
    # the renewal landed in the durable checkpoint with a CAS version
    cp = CheckpointStore(str(tmp_path / "cp.json")).load_checkpoint(KEY)
    assert cp["renewal"]["subscription_id"] == "sub"
    assert cp["version"]
    # a second coordinator pass sees healthy state and does not re-renew
    d2 = c.renew_if_due(KEY)
    assert not d2["attempted"]
