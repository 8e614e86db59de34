"""Listener→queue bridge (reference ``pkg/mail/listener_queue.go``).

Listener hints (coarse mailbox pokes, webhook change events, per-message
changes) converge into exactly two bounded job kinds: ``reconcile`` (run
the mailbox's delta from its durable checkpoint) and ``fetch_message``
(fetch one stable message reference). The bridge:

- derives the job from a change (:236-267): an upsert with a fetchable
  ref (provider message id, or IMAP uid+uidvalidity) whose scope matches
  the mailbox becomes ``fetch_message``; anything else — deletes,
  resets, coarse hints, unstable refs — collapses to ``reconcile``;
- dedups *successful* enqueues by a stable length-prefixed SHA-256 key
  over kind/mailbox/cursor/change (+ref for fetch jobs) (:67-96), with
  a TTL and FIFO capacity bound (defaults 5 min / 4096, :282-309) — a
  failed enqueue is NOT remembered, so it retries;
- the source id comes from configuration, never from the notification
  (:134-141, 173-179).

This is the piece that makes push listeners safe at scale: a storm of
notifications for one hot mailbox coalesces into one reconcile job per
TTL window instead of one crawl per notification.
"""

from __future__ import annotations

import hashlib
import time
from collections import OrderedDict

DEFAULT_DEDUP_CAPACITY = 4096
DEFAULT_DEDUP_TTL = 300.0

JOB_RECONCILE = "reconcile"
JOB_FETCH_MESSAGE = "fetch_message"

_CHANGE_KINDS = ("upsert", "delete", "reset")


class InvalidListenerChange(ValueError):
    pass


def stable_mailbox_id(mailbox: dict | None) -> str:
    mailbox = mailbox or {}
    return (mailbox.get("id") or "").strip() or \
        (mailbox.get("name") or "").strip()


def listener_job_stable_key(job: dict) -> str:
    """StableKey (:67-96): operational metadata excluded."""
    h = hashlib.sha256()

    def part(value: str) -> None:
        h.update(str(len(value)).encode())
        h.update(b":")
        h.update(value.encode())

    mailbox = job.get("mailbox") or {}
    cursor = job.get("cursor") or {}
    change = job.get("change") or {}
    part(job.get("kind", ""))
    part((mailbox.get("source_id") or "").strip())
    part((mailbox.get("provider") or "").strip().lower())
    part((mailbox.get("account_id") or "").strip())
    part(stable_mailbox_id(mailbox.get("mailbox")))
    part(cursor.get("token", "") or "")
    part(str(cursor.get("history_id", 0) or 0))
    part(str(cursor.get("uid_validity", 0) or 0))
    part(str(cursor.get("uid", 0) or 0))
    part(change.get("kind", "") or "")
    if job.get("kind") == JOB_FETCH_MESSAGE:
        ref = change.get("ref") or {}
        part((ref.get("provider") or "").strip().lower())
        part((ref.get("account_id") or "").strip())
        part(stable_mailbox_id(ref.get("mailbox")))
        part((ref.get("provider_message_id") or "").strip())
        part(str(ref.get("uid_validity", 0) or 0))
        part(str(ref.get("uid", 0) or 0))
        part((ref.get("version") or "").strip())
    return h.hexdigest()


def _fetchable(ref: dict) -> bool:
    return bool((ref.get("provider_message_id") or "").strip()) or \
        bool(ref.get("uid") and ref.get("uid_validity"))


def _scope_matches(key: dict, ref: dict) -> bool:
    return ((ref.get("provider") or "").strip().lower()
            == (key.get("provider") or "").lower()
            and (ref.get("account_id") or "").strip()
            == key.get("account_id")
            and stable_mailbox_id(ref.get("mailbox"))
            == stable_mailbox_id(key.get("mailbox")))


def job_for(source_id: str, change: dict) -> dict:
    """jobFor (:236-267)."""
    mailbox = dict(change.get("mailbox") or {})
    mailbox["source_id"] = source_id
    mailbox["provider"] = (mailbox.get("provider") or "").strip()
    mailbox["account_id"] = (mailbox.get("account_id") or "").strip()
    if not mailbox["provider"] or not mailbox["account_id"] \
            or not stable_mailbox_id(mailbox.get("mailbox")):
        raise InvalidListenerChange(
            "provider, account, and mailbox are required")
    job = {"kind": JOB_RECONCILE, "mailbox": mailbox,
           "cursor": change.get("cursor") or {}, "change": {}}
    kind = (change.get("change") or {}).get("kind") or ""
    if not kind:
        return job
    if kind not in _CHANGE_KINDS:
        raise InvalidListenerChange(f"unsupported change kind {kind!r}")
    ref = (change.get("change") or {}).get("ref") or {}
    if kind != "upsert" or not _fetchable(ref):
        job["change"] = {"kind": kind}
        return job
    if not _scope_matches(mailbox, ref):
        raise InvalidListenerChange(
            "message reference does not match mailbox scope")
    job["kind"] = JOB_FETCH_MESSAGE
    job["change"] = {"kind": kind, "ref": ref}
    return job


class ListenerQueueBridge:
    """``queue(job)`` is the enqueue boundary (raise → retryable)."""

    def __init__(self, source_id: str, queue,
                 dedup_capacity: int = 0, dedup_ttl: float = 0.0,
                 now=None):
        source_id = (source_id or "").strip()
        if not source_id:
            raise ValueError("source ID is required")
        if queue is None:
            raise ValueError("queue is required")
        if dedup_capacity < 0 or dedup_ttl < 0:
            raise ValueError("dedup bounds cannot be negative")
        self.source_id = source_id
        self.queue = queue
        self.capacity = dedup_capacity or DEFAULT_DEDUP_CAPACITY
        self.ttl = dedup_ttl or DEFAULT_DEDUP_TTL
        self.now = now or time.time
        self._entries: OrderedDict[str, float] = OrderedDict()  # key→expiry

    # EventSink.Notify: coarse mailbox hint → reconcile job
    def notify(self, mailbox_key: dict) -> bool:
        return self.submit({"mailbox": mailbox_key})

    # EmailChangeQueue.Enqueue: webhook event → reconcile job
    def submit_event(self, event: dict) -> bool:
        return self.submit({
            "mailbox": {"provider": event.get("provider", ""),
                        "account_id": event.get("account_id", ""),
                        "mailbox": event.get("mailbox") or {}},
            "cursor": event.get("cursor") or {},
            "change": {"kind": event.get("change_type", "")},
        })

    def submit(self, change: dict) -> bool:
        """Returns False when a successful, unexpired duplicate was
        coalesced; raises if the queue rejects the job."""
        job = job_for(self.source_id, change)
        key = listener_job_stable_key(job)
        now = self.now()
        self._purge_expired(now)
        if key in self._entries:
            return False
        self.queue(job)
        self._remember(key, now + self.ttl)
        return True

    def _purge_expired(self, now: float) -> None:
        while self._entries:
            key, expires = next(iter(self._entries.items()))
            if expires > now:
                break
            del self._entries[key]

    def _remember(self, key: str, expires_at: float) -> None:
        while len(self._entries) >= self.capacity:
            self._entries.popitem(last=False)
        self._entries[key] = expires_at
