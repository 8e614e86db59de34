"""Versioned mailbox checkpoints + the message ingestion lifecycle
(reference ``pkg/mail/database_state_store.go`` + ``message_status.go``).

Each (source, provider, account, mailbox) owns ONE checkpoint row:
cursor, message status, error bookkeeping, renewal metadata, and a
version string for compare-and-swap commits — concurrent ingestion
workers cannot silently clobber each other's progress. Mirrored rules:

- CAS: a commit supplies the version it loaded; a mismatch (including
  committing version "x" over a missing row) is a conflict
  (:105-152);
- checkpoint bounds: 2048-char errors, 191-char subscription ids,
  2048-char resource paths, valid status tokens (:187-207);
- the message lifecycle is an explicit DAG — discovered → fetched →
  parsed → normalized → attachments_processed → links_enqueued →
  completed, every active state may fail retryably or permanently,
  retryable_failure may restart at discovered or be promoted to
  permanent, and completed/permanent_failure are terminal
  (message_status.go:36-124);
- a fresh row accepts any valid status; transitions only apply against
  an existing row's previous status (:209-221).

Storage here is the repo's durable-JSON dialect (atomic rename, like
``MailStateStore``) — the SQL store's serializable transaction becomes
a process-wide lock, which is exactly the isolation level a single
driver process needs; on a cluster this state becomes a small keyed
table behind the same interface.
"""

from __future__ import annotations

import json
import os
import threading

MAX_ERROR_LENGTH = 2048
MAX_SUBSCRIPTION_ID_LENGTH = 191
MAX_RESOURCE_PATH_LENGTH = 2048

STATUSES = ("discovered", "fetched", "parsed", "normalized",
            "attachments_processed", "links_enqueued", "completed",
            "retryable_failure", "permanent_failure")
TERMINAL = ("completed", "permanent_failure")

_TRANSITIONS = {
    "discovered": {"fetched", "retryable_failure", "permanent_failure"},
    "fetched": {"parsed", "retryable_failure", "permanent_failure"},
    "parsed": {"normalized", "retryable_failure", "permanent_failure"},
    "normalized": {"attachments_processed", "retryable_failure",
                   "permanent_failure"},
    "attachments_processed": {"links_enqueued", "retryable_failure",
                              "permanent_failure"},
    "links_enqueued": {"completed", "retryable_failure",
                       "permanent_failure"},
    "retryable_failure": {"discovered", "permanent_failure"},
}


class CheckpointConflict(RuntimeError):
    pass


class InvalidCheckpoint(ValueError):
    pass


def valid_status(status: str) -> bool:
    return status in STATUSES


def is_terminal(status: str) -> bool:
    return status in TERMINAL


def can_transition(current: str, next_status: str) -> bool:
    if not valid_status(current) or not valid_status(next_status) \
            or is_terminal(current):
        return False
    return next_status in _TRANSITIONS.get(current, set())


def validate_status_transition(current: str, next_status: str) -> None:
    if not valid_status(current):
        raise InvalidCheckpoint(f"current status {current!r} is invalid")
    if not valid_status(next_status):
        raise InvalidCheckpoint(f"next status {next_status!r} is invalid")
    if is_terminal(current):
        raise InvalidCheckpoint(
            f"{current!r} is terminal and cannot transition to "
            f"{next_status!r}")
    if not can_transition(current, next_status):
        raise InvalidCheckpoint(
            f"invalid transition {current!r} to {next_status!r}")


def empty_checkpoint() -> dict:
    return {"cursor": {}, "message_status": "", "content_hash": "",
            "error_count": 0, "last_error": "", "renewal": {},
            "version": ""}


def validate_checkpoint(checkpoint: dict) -> None:
    status = checkpoint.get("message_status", "")
    if status and not valid_status(status):
        raise InvalidCheckpoint(f"message status {status!r} is invalid")
    if len(checkpoint.get("last_error", "")) > MAX_ERROR_LENGTH:
        raise InvalidCheckpoint(
            f"last error exceeds {MAX_ERROR_LENGTH} bytes")
    renewal = checkpoint.get("renewal") or {}
    if len(renewal.get("subscription_id", "") or "") > \
            MAX_SUBSCRIPTION_ID_LENGTH:
        raise InvalidCheckpoint(
            f"subscription ID exceeds {MAX_SUBSCRIPTION_ID_LENGTH} bytes")
    if len(renewal.get("resource_path", "") or "") > \
            MAX_RESOURCE_PATH_LENGTH:
        raise InvalidCheckpoint(
            f"resource path exceeds {MAX_RESOURCE_PATH_LENGTH} bytes")
    r_status = renewal.get("status", "")
    if r_status and r_status not in ("healthy", "due", "expired", "failed"):
        raise InvalidCheckpoint(
            f"renewal status {r_status!r} is invalid")
    if len(renewal.get("last_error", "") or "") > MAX_ERROR_LENGTH:
        raise InvalidCheckpoint(
            f"renewal error exceeds {MAX_ERROR_LENGTH} bytes")


def _identity(key: dict) -> str:
    mailbox = key.get("mailbox") or {}
    parts = [str(key.get("source_id", "")).strip(),
             (key.get("provider") or "").strip().lower(),
             (key.get("account_id") or "").strip(),
             (mailbox.get("id") or "").strip()
             or (mailbox.get("name") or "").strip()]
    if not all(parts):
        raise InvalidCheckpoint(
            "mailbox key requires source, provider, account, and mailbox")
    return "\x1f".join(parts)


class CheckpointStore:
    """Durable (JSON file) or in-memory (path=None) CAS checkpoint
    store; also satisfies the RenewalCoordinator's store seam via
    ``load``/``commit`` over the ``renewal`` sub-document."""

    def __init__(self, path: str | None = None):
        self.path = path
        self._lock = threading.Lock()
        self._state: dict[str, dict] = {}
        self._seq = 0
        if path and os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            self._state = data.get("checkpoints", {})
            self._seq = data.get("seq", 0)

    def _persist(self) -> None:
        if not self.path:
            return
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"checkpoints": self._state, "seq": self._seq}, f)
        os.replace(tmp, self.path)

    def load_checkpoint(self, key: dict) -> dict:
        identity = _identity(key)
        with self._lock:
            found = self._state.get(identity)
            return json.loads(json.dumps(found)) if found \
                else empty_checkpoint()

    def commit_checkpoint(self, key: dict, previous_version: str,
                          next_checkpoint: dict) -> str:
        identity = _identity(key)
        validate_checkpoint(next_checkpoint)
        with self._lock:
            current = self._state.get(identity)
            current_version = (current or {}).get("version", "")
            if current_version != previous_version:
                raise CheckpointConflict(
                    f"checkpoint version {previous_version!r} does not "
                    f"match current {current_version!r}")
            if current is None and previous_version:
                raise CheckpointConflict(
                    "cannot commit over a missing checkpoint with a "
                    "non-empty version")
            next_status = next_checkpoint.get("message_status", "")
            current_status = (current or {}).get("message_status", "")
            if next_status and current_status \
                    and next_status != current_status:
                validate_status_transition(current_status, next_status)
            elif next_status and not valid_status(next_status):
                raise InvalidCheckpoint(
                    f"message status {next_status!r} is invalid")
            self._seq += 1
            version = f"v{self._seq}"
            stored = {**empty_checkpoint(), **next_checkpoint,
                      "version": version}
            self._state[identity] = json.loads(json.dumps(stored))
            self._persist()
            return version

    # -- RenewalCoordinator store seam --------------------------------------
    def load(self, key: dict):
        checkpoint = self.load_checkpoint(key)
        return checkpoint.get("renewal") or {}, checkpoint.get("version", "")

    def commit(self, key: dict, version: str, renewal: dict) -> str:
        checkpoint = self.load_checkpoint(key)
        serializable = {
            k: (v.isoformat() if hasattr(v, "isoformat") else v)
            for k, v in (renewal or {}).items()}
        checkpoint["renewal"] = serializable
        return self.commit_checkpoint(key, version, checkpoint)
