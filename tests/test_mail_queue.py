"""Listener-queue bridge tests (pkg/mail/listener_queue.go): job
derivation, stable-key dedup with TTL + capacity, retry-on-failure,
scope checks."""

import pytest

from thecrowler_ray.sources.mail_queue import (
    InvalidListenerChange,
    ListenerQueueBridge,
    job_for,
    listener_job_stable_key,
)

MB = {"provider": "imap", "account_id": "acct",
      "mailbox": {"id": "", "name": "INBOX"}}


def test_job_derivation():
    # coarse hint → reconcile
    j = job_for("s1", {"mailbox": MB})
    assert j["kind"] == "reconcile" and j["mailbox"]["source_id"] == "s1"
    # delete → reconcile carrying the kind
    j = job_for("s1", {"mailbox": MB, "change": {"kind": "delete"}})
    assert j["kind"] == "reconcile" and j["change"]["kind"] == "delete"
    # upsert with a stable IMAP ref → fetch_message
    ref = {"provider": "imap", "account_id": "acct",
           "mailbox": {"name": "INBOX"}, "uid": 7, "uid_validity": 3}
    j = job_for("s1", {"mailbox": MB,
                       "change": {"kind": "upsert", "ref": ref}})
    assert j["kind"] == "fetch_message"
    # upsert with an unstable ref (uid but no uidvalidity) → reconcile
    j = job_for("s1", {"mailbox": MB,
                       "change": {"kind": "upsert",
                                  "ref": {**ref, "uid_validity": 0}}})
    assert j["kind"] == "reconcile"
    # mismatched scope is an error
    with pytest.raises(InvalidListenerChange):
        job_for("s1", {"mailbox": MB,
                       "change": {"kind": "upsert",
                                  "ref": {**ref, "account_id": "other"}}})
    with pytest.raises(InvalidListenerChange):
        job_for("s1", {"mailbox": {"provider": "", "account_id": "a",
                                   "mailbox": {"name": "x"}}})
    with pytest.raises(InvalidListenerChange):
        job_for("s1", {"mailbox": MB, "change": {"kind": "archived"}})


def test_stable_key_properties():
    j1 = job_for("s1", {"mailbox": MB})
    j2 = job_for("s1", {"mailbox": {**MB,
                                    "mailbox": {"id": "", "name": "INBOX"}}})
    assert listener_job_stable_key(j1) == listener_job_stable_key(j2)
    # provider case-insensitive, cursor included
    j3 = job_for("s1", {"mailbox": {**MB, "provider": "IMAP "}})
    assert listener_job_stable_key(j3) == listener_job_stable_key(j1)
    j4 = job_for("s1", {"mailbox": MB, "cursor": {"history_id": 9}})
    assert listener_job_stable_key(j4) != listener_job_stable_key(j1)


def test_bridge_coalescing_ttl_and_retry():
    clock = [1000.0]
    jobs = []
    bridge = ListenerQueueBridge("s1", jobs.append, dedup_capacity=8,
                                 dedup_ttl=60.0, now=lambda: clock[0])
    assert bridge.notify(MB) is True
    assert bridge.notify(MB) is False  # coalesced inside the TTL
    assert len(jobs) == 1
    clock[0] += 61.0
    assert bridge.notify(MB) is True  # TTL expired → re-enqueued
    # failed enqueue is retryable (key not remembered)
    def failing(job):
        raise RuntimeError("down")

    b2 = ListenerQueueBridge("s1", failing, now=lambda: clock[0])
    with pytest.raises(RuntimeError):
        b2.notify(MB)
    b2.queue = jobs.append
    assert b2.notify(MB) is True

    # capacity bound evicts oldest keys
    b3 = ListenerQueueBridge("s1", jobs.append, dedup_capacity=2,
                             dedup_ttl=1e9, now=lambda: clock[0])
    for name in ("A", "B", "C"):
        assert b3.notify({**MB, "mailbox": {"name": name}}) is True
    assert b3.notify({**MB, "mailbox": {"name": "A"}}) is True  # evicted
    assert b3.notify({**MB, "mailbox": {"name": "C"}}) is False


def test_bridge_event_path():
    jobs = []
    bridge = ListenerQueueBridge("s1", jobs.append)
    assert bridge.submit_event({
        "provider": "gmail", "account_id": "a@b.co",
        "mailbox": {"id": "*", "name": "All mailboxes"},
        "cursor": {"history_id": 42}, "change_type": "upsert"}) is True
    job = jobs[0]
    # webhook events always collapse to reconcile (cursors advisory)
    assert job["kind"] == "reconcile"
    assert job["mailbox"]["source_id"] == "s1"
    assert job["cursor"]["history_id"] == 42
    with pytest.raises(ValueError):
        ListenerQueueBridge(" ", jobs.append)
    with pytest.raises(ValueError):
        ListenerQueueBridge("s1", None)
