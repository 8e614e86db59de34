"""Email listener reconciliation (reference
``services/events/email_listener_runtime.go``).

The events service's master replica owns one listener per listen-mode
email source and *reconciles* the running set against the Sources table
every refresh interval (:54-113): a source whose config fingerprint is
unchanged keeps its listener, a changed fingerprint cancels + restarts
it, sources that disappeared are stopped, and a failed start leaves the
source absent until the next pass. Mirrored here with the listener
construction injected (``listener_factory``) — the real IMAP-IDLE /
polling listeners need live sockets; everything the manager itself does
is pure bookkeeping:

- fingerprints are SHA-256 over the canonical config JSON
  (emailListenerFingerprint, :243-247 — ours canonicalizes with sorted
  keys since dict order isn't Go struct order);
- source eligibility mirrors loadEmailListenerSources (:187-224):
  enabled, an email-scheme url, ``crawl.mode == "listen"``,
  ``listener.enabled``, and a validator seam;
- mailbox keys come from the include list with blanks skipped
  (emailListenerMailboxes, :226-241);
- a listener handle is anything with ``.stop()``; the factory returning
  ``None``/raising counts as a failed start (start, :115-134).
"""

from __future__ import annotations

import hashlib
import json

EMAIL_SCHEMES = ("email://", "imap://", "imaps://", "gmail://",
                 "graph-mail://")


def listener_fingerprint(config: dict) -> str:
    encoded = json.dumps(config, sort_keys=True, separators=(",", ":"),
                         default=str)
    return hashlib.sha256(encoded.encode("utf-8")).hexdigest()


def listener_mailboxes(source_id, config: dict) -> list[dict]:
    include = ((config.get("mailboxes") or {}).get("include")) or []
    keys = []
    for name in include:
        name = (name or "").strip()
        if not name:
            continue
        keys.append({
            "source_id": str(source_id),
            "provider": (config.get("connector") or {}).get("provider", ""),
            "account_id": (config.get("auth") or {}).get("identity", ""),
            "mailbox": {"id": name, "name": name},
        })
    return keys


def load_listener_sources(sources: list[dict], validate=None) -> list[dict]:
    """loadEmailListenerSources over an in-memory source list: each item
    is ``{source_id, url, disabled, config}``. Invalid configs are
    skipped, not fatal (the reference logs and continues)."""
    out = []
    for s in sources:
        if s.get("disabled"):
            continue
        url = (s.get("url") or "").lower()
        if not url.startswith(EMAIL_SCHEMES):
            continue
        config = s.get("config") or {}
        if (config.get("crawl") or {}).get("mode") != "listen":
            continue
        if not (config.get("listener") or {}).get("enabled"):
            continue
        if validate is not None:
            try:
                validate(config)
            except Exception:
                continue
        out.append({"id": s["source_id"], "config": config})
    return out


class MailListenerManager:
    """Reconciling owner of per-source listeners. ``listener_factory``
    receives ``(source, mailboxes)`` and returns a handle with
    ``.stop()`` (or raises / returns None → failed start)."""

    def __init__(self, listener_factory):
        self.listener_factory = listener_factory
        self.running: dict = {}  # source_id -> (fingerprint, handle)

    def reconcile(self, sources: list[dict]) -> dict:
        """One reconcile pass; returns counters for observability."""
        stats = {"started": 0, "restarted": 0, "stopped": 0,
                 "kept": 0, "failed": 0}
        desired = {}
        for source in sources:
            desired[source["id"]] = source
            fingerprint = listener_fingerprint(source["config"])
            current = self.running.get(source["id"])
            if current is not None and current[0] == fingerprint:
                stats["kept"] += 1
                continue
            if current is not None:
                current[1].stop()
                del self.running[source["id"]]
                stats["restarted"] += 1
            if self._start(source, fingerprint):
                if current is None:
                    stats["started"] += 1
            else:
                stats["failed"] += 1
                if current is not None:
                    stats["restarted"] -= 1
        stale = [sid for sid in self.running if sid not in desired]
        for sid in stale:
            self.running.pop(sid)[1].stop()
            stats["stopped"] += 1
        return stats

    def _start(self, source: dict, fingerprint: str) -> bool:
        mailboxes = listener_mailboxes(source["id"], source["config"])
        if not mailboxes:
            return False  # "no included mailboxes are configured"
        try:
            handle = self.listener_factory(source, mailboxes)
        except Exception:
            return False
        if handle is None:
            return False
        self.running[source["id"]] = (fingerprint, handle)
        return True

    def active(self) -> int:
        return len(self.running)

    def stop_all(self) -> None:
        listeners = list(self.running.values())
        self.running.clear()
        for _fp, handle in listeners:
            handle.stop()
