"""Provider-subscription renewal coordination (reference
``pkg/mail/renewal.go``).

Push listeners (Gmail watches, Graph subscriptions) expire; the
coordinator decides *when* a renewal is due, performs due attempts
through the provider-neutral renewer seam, persists every attempted
outcome with compare-and-swap versions, and hands the next attempt time
to an optional scheduler hook. The deterministic rules mirrored:

- ``next_renewal_at`` = expiry − safety margin, with the margin capped
  at half the granted lifetime so a short-lived watch can't trigger an
  immediate renewal loop (:109-128);
- due when no expiry is recorded or the boundary has passed; an expiry
  at *now* is both due and expired (:130-141);
- status precedence failed > expired > due > healthy (:93-107);
- failures increment a counter, keep the old expiry, bound the error
  text at 2048 chars, and retry after ``retry_delay`` — capped at half
  the time remaining before expiry (:175-199, 222-229);
- success resets failures and records the provider's authoritative
  expiry, which must be in the future (:180-182 guards a provider
  returning a stale watch).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

DEFAULT_RETRY_DELAY = 300.0
MAX_ERROR_LENGTH = 2048

STATUS_HEALTHY = "healthy"
STATUS_DUE = "due"
STATUS_EXPIRED = "expired"
STATUS_FAILED = "failed"


def _utc(dt) -> datetime | None:
    if dt is None or dt == "":
        return None
    if isinstance(dt, str):  # durable stores round-trip via ISO strings
        dt = datetime.fromisoformat(dt)
    if dt.tzinfo is None:
        return dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


def empty_metadata() -> dict:
    return {"subscription_id": "", "resource_path": "", "status": "",
            "last_renewed_at": None, "expires_at": None,
            "last_attempt_at": None, "failure_count": 0, "last_error": ""}


def next_renewal_at(metadata: dict, safety_margin: float):
    expires_at = _utc(metadata.get("expires_at"))
    if expires_at is None:
        return None
    margin = max(safety_margin, 0.0)
    last_renewed = _utc(metadata.get("last_renewed_at"))
    if last_renewed is not None and expires_at > last_renewed:
        half = (expires_at - last_renewed).total_seconds() / 2
        margin = min(margin, half)
    return expires_at - timedelta(seconds=margin)


def renewal_due(now: datetime, metadata: dict,
                safety_margin: float) -> tuple[bool, bool]:
    now = _utc(now)
    expires_at = _utc(metadata.get("expires_at"))
    if expires_at is None:
        return True, False
    expired = expires_at <= now
    return expired or next_renewal_at(metadata, safety_margin) <= now, \
        expired


def renewal_status_at(now: datetime, metadata: dict,
                      safety_margin: float) -> str:
    due, expired = renewal_due(now, metadata, safety_margin)
    if metadata.get("failure_count", 0) > 0 or \
            metadata.get("status") == STATUS_FAILED:
        return STATUS_FAILED
    if expired:
        return STATUS_EXPIRED
    if due:
        return STATUS_DUE
    return STATUS_HEALTHY


def safe_renewal_retry_at(now: datetime, expires_at,
                          retry_delay: float) -> datetime:
    now = _utc(now)
    retry_at = now + timedelta(seconds=retry_delay)
    expires_at = _utc(expires_at)
    if expires_at is None or expires_at <= now or retry_at < expires_at:
        return retry_at
    return now + (expires_at - now) / 2


class RenewalCoordinator:
    """Seams: ``store.load(key) -> (metadata, version)``,
    ``store.commit(key, version, metadata)`` (CAS — raise on conflict),
    ``renewer(key) -> {subscription_id, resource_path, expires_at}``
    (raise on provider error), ``scheduler(key, at)`` optional."""

    def __init__(self, store, renewer, scheduler=None,
                 safety_margin: float = 0.0,
                 retry_delay: float = 0.0, now=None):
        if store is None:
            raise ValueError("renewal coordinator requires a state store")
        if renewer is None:
            raise ValueError(
                "renewal coordinator requires a subscription renewer")
        if safety_margin < 0:
            raise ValueError("renewal safety margin cannot be negative")
        self.store = store
        self.renewer = renewer
        self.scheduler = scheduler
        self.safety_margin = safety_margin
        self.retry_delay = retry_delay or DEFAULT_RETRY_DELAY
        self.now = now or (lambda: datetime.now(timezone.utc))

    def renew_if_due(self, key) -> dict:
        now = _utc(self.now())
        metadata, version = self.store.load(key)
        metadata = {**empty_metadata(), **(metadata or {})}
        due, expired = renewal_due(now, metadata, self.safety_margin)
        decision = {"due": due, "expired": expired, "attempted": False,
                    "renewed": False, "metadata": metadata,
                    "status": renewal_status_at(now, metadata,
                                                self.safety_margin),
                    "next_attempt": None, "error": None}
        if not due:
            decision["next_attempt"] = next_renewal_at(metadata,
                                                       self.safety_margin)
            self._schedule(key, decision["next_attempt"])
            return decision

        decision["attempted"] = True
        next_meta = dict(metadata)
        next_meta["last_attempt_at"] = now
        renew_error = None
        try:
            result = self.renewer(key)
            result_expiry = _utc(result.get("expires_at"))
            if result_expiry is None or result_expiry <= now:
                raise ValueError("provider returned a watch expiration "
                                 "that is not in the future")
        except Exception as e:
            renew_error = e
        if renew_error is not None:
            next_meta["failure_count"] = metadata.get("failure_count", 0) + 1
            next_meta["last_error"] = str(renew_error)[:MAX_ERROR_LENGTH]
            next_meta["status"] = STATUS_FAILED
            decision["status"] = STATUS_FAILED
            decision["next_attempt"] = safe_renewal_retry_at(
                now, next_meta.get("expires_at"), self.retry_delay)
        else:
            next_meta.update({
                "subscription_id":
                    (result.get("subscription_id") or "").strip(),
                "resource_path": (result.get("resource_path") or "").strip(),
                "status": STATUS_HEALTHY,
                "last_renewed_at": now,
                "expires_at": result_expiry,
                "failure_count": 0,
                "last_error": "",
            })
            decision["renewed"] = True
            decision["status"] = STATUS_HEALTHY
            decision["next_attempt"] = next_renewal_at(next_meta,
                                                       self.safety_margin)
        self.store.commit(key, version, next_meta)
        decision["metadata"] = next_meta
        self._schedule(key, decision["next_attempt"])
        decision["error"] = renew_error
        return decision

    def _schedule(self, key, at) -> None:
        if self.scheduler is not None:
            self.scheduler(key, at)
